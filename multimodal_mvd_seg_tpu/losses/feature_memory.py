"""Class-wise contrastive feature memory bank (device-resident, fixed shape).

Reconstruction of the reference's missing module
``nnunetv2.training.loss.feature_memory`` (imported at MVDTrainer.py:72;
SURVEY.md §0): ``FeatureMemory(num_samples=60, memory_per_class=256,
feature_size=256, n_classes=5)`` with a per-class ``.memory`` and
``.add_features_from_sample_learned(network, projected_feats, labels,
batch_size, TOF=bool)`` (usage at MVDTrainer.py:98,954-955,969-971) —
semantics follow Alonso et al., "Semi-Supervised Semantic Segmentation with
Pixel-Level Contrastive Learning from a Class-wise Memory Bank" (ICCV'21):
each insert ranks the class's candidate features with the model's learned
sigmoid selector and pushes the ``batch_size ×
max(1, round(memory_per_class/num_samples))`` LOWEST-scoring (hardest)
vectors onto a per-class FIFO of length ``memory_per_class``.

TPU-native re-design: the python list-of-variable-length-numpy-arrays
becomes a fixed-shape PyTree living in HBM —
``memory (C, M, F) float32`` + ``valid (C, M) bool`` — and the insert is a
pure jittable function over fixed-cap candidate sets with masks (XLA needs
static shapes; variable-N gathers are padded and masked, SURVEY.md §7
"hard parts"). The whole update runs inside the train-step jit: no
host↔device traffic.
"""

from typing import Tuple

import flax
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class FeatureMemoryState:
    memory: jnp.ndarray   # (n_classes, memory_per_class, feature_size) f32
    valid: jnp.ndarray    # (n_classes, memory_per_class) bool


def init_feature_memory(n_classes: int = 5, memory_per_class: int = 256,
                        feature_size: int = 256) -> FeatureMemoryState:
    return FeatureMemoryState(
        memory=jnp.zeros((n_classes, memory_per_class, feature_size),
                         jnp.float32),
        valid=jnp.zeros((n_classes, memory_per_class), bool))


def elements_per_class(batch_size: int, memory_per_class: int = 256,
                       num_samples: int = 60) -> int:
    """Per-insert push size: batch_size × max(1, round(M/num_samples))."""
    return batch_size * max(1, int(round(memory_per_class / num_samples)))


def sample_class_rows(key: jax.Array, labels: jnp.ndarray,
                      eligible: jnp.ndarray, n_classes: int,
                      k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniformly sample ≤k eligible row indices per class (fixed shape).

    labels/eligible: flat (N,). Returns (idx (C,k) int32, mask (C,k) bool).
    Replaces the reference's data-dependent boolean gather
    (MVDTrainer.py:945-948) with masked top-k over random priorities.
    """
    n = labels.shape[0]
    priority = jax.random.uniform(key, (n,))

    def per_class(c):
        elig_c = eligible & (labels == c)
        keyed = jnp.where(elig_c, priority, -jnp.inf)
        top, idx = jax.lax.top_k(keyed, k)
        return idx.astype(jnp.int32), jnp.isfinite(top)

    idx, mask = jax.vmap(per_class)(jnp.arange(n_classes))
    return idx, mask


def add_features_learned(state: FeatureMemoryState,
                         features: jnp.ndarray,
                         feat_mask: jnp.ndarray,
                         selector_scores: jnp.ndarray,
                         n_push: int) -> FeatureMemoryState:
    """Push the n_push lowest-selector-score valid candidates per class.

    features: (C, K, F) per-class candidate feature rows (already projected,
        gradient-stopped — the reference inserts under no_grad eval-mode
        heads, MVDTrainer.py:949-953).
    feat_mask: (C, K) candidate validity.
    selector_scores: (C, K) raw selector logits for each candidate under its
        class's ``contrastive_class_selector_c`` head.
    """
    features = jax.lax.stop_gradient(features.astype(jnp.float32))
    rank = jax.nn.sigmoid(jax.lax.stop_gradient(selector_scores))
    # lowest rank = hardest examples kept (ascending sort; take first n_push)
    keyed = jnp.where(feat_mask, rank, jnp.inf)
    neg_top, idx = jax.lax.top_k(-keyed, n_push)          # (C, n_push)
    push_valid = jnp.isfinite(neg_top)
    pushed = jnp.take_along_axis(features, idx[..., None], axis=1)

    # each class's FIFO advances by ITS OWN number of valid pushes — a
    # class with no candidates this batch keeps its memory untouched (the
    # reference only appends when a class has new features; a fixed
    # n_push shift would evict real entries for invalid rows). pushed is
    # valid-first (invalid keyed=inf sorts last), so the kept rows are
    # rows [0, n_valid) of pushed followed by rows [0, M - n_valid) of
    # the old memory.
    m = state.memory.shape[1]
    combined_m = jnp.concatenate([pushed, state.memory], axis=1)
    combined_v = jnp.concatenate([push_valid, state.valid], axis=1)
    n_valid = push_valid.sum(axis=1, keepdims=True)       # (C, 1)
    j = jnp.arange(m)[None, :]
    row = jnp.where(j < n_valid, j, j - n_valid + n_push)  # (C, M)
    new_memory = jnp.take_along_axis(combined_m, row[..., None], axis=1)
    new_valid = jnp.take_along_axis(combined_v, row, axis=1)
    return FeatureMemoryState(memory=new_memory, valid=new_valid)
