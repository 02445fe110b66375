"""Class-wise contrastive memory loss.

Parity: reference nnunetv2/training/loss/contrastive_losses.py:4-66
(``contrastive_class_to_class_learned_memory``): per class, L2-normalize the
current features and the memory bank, form the cosine-distance matrix
(1 − sim ∈ [0,2]), reweight the rows by the class's learned sigmoid selector
on the (detached) features and the columns by the memory selector on the
memory vectors — each rescaled so the weights average to 1 over the set —
then take the mean distance; classes with ≤1 feature or ≤1 memory vector
are skipped; the sum is divided by ``num_classes`` regardless.

TPU-native re-design: fixed-cap per-class feature sets with validity masks
instead of data-dependent boolean gathers (static shapes for XLA); the
per-class loop is a ``vmap``; selector scores are computed by the caller
(flax heads live on the model) and passed in. All math fp32.
"""

import jax
import jax.numpy as jnp

from ..utils.helpers import l2_normalize as _l2norm

_EPS = 1e-12


def contrastive_class_to_class_learned_memory(
        features: jnp.ndarray,           # (C, K, F) per-class feature rows
        feat_mask: jnp.ndarray,          # (C, K) validity
        memory: jnp.ndarray,             # (C, M, F)
        memory_valid: jnp.ndarray,       # (C, M)
        selector_scores: jnp.ndarray,    # (C, K) raw logits, detached feats
        selector_scores_memory: jnp.ndarray,  # (C, M) raw logits
        num_classes: int) -> jnp.ndarray:
    features = features.astype(jnp.float32)
    memory = memory.astype(jnp.float32)

    def per_class(feats, fmask, mem, mmask, s_f, s_m):
        fmaskf = fmask.astype(jnp.float32)          # (K,)
        mmaskf = mmask.astype(jnp.float32)          # (M,)
        n_f = fmaskf.sum()
        n_m = mmaskf.sum()

        fn = _l2norm(feats)
        mn = _l2norm(mem)
        sim = fn @ mn.T                              # (K, M) — MXU
        distances = 1.0 - sim

        w_f = jax.nn.sigmoid(s_f) * fmaskf
        w_f = (n_f / jnp.maximum(w_f.sum(), _EPS)) * w_f         # mean→1
        w_m = jax.nn.sigmoid(s_m) * mmaskf
        w_m = (n_m / jnp.maximum(w_m.sum(), _EPS)) * w_m

        weighted = distances * w_f[:, None] * w_m[None, :]
        pair_mask = fmaskf[:, None] * mmaskf[None, :]
        mean_dist = (weighted * pair_mask).sum() / jnp.maximum(
            pair_mask.sum(), 1.0)
        include = ((n_f > 1) & (n_m > 1)).astype(jnp.float32)
        return mean_dist * include

    losses = jax.vmap(per_class)(features, feat_mask, memory, memory_valid,
                                 selector_scores, selector_scores_memory)
    return losses.sum() / num_classes
