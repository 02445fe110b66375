"""Cross-entropy and TopK losses.

Parity: reference nnunetv2/training/loss/robust_ce_loss.py:6-34
(RobustCrossEntropyLoss, TopKLoss). Channels-last logits (b, *spatial, c),
integer targets (b, *spatial); optional per-voxel mask (ignore label)."""

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits: jnp.ndarray, target: jnp.ndarray,
                       mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # clamp target so one_hot of ignore-labels is valid; mask removes them
    tgt = jnp.clip(target, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    if mask is not None:
        m = mask.astype(jnp.float32)
        return (nll * m).sum() / jnp.clip(m.sum(), 1.0)
    return nll.mean()


def topk_loss(logits: jnp.ndarray, target: jnp.ndarray, k_percent: float = 10.0,
              mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean over the k% highest-loss voxels (reference TopKLoss, k=10)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.clip(target, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    if mask is not None:
        nll = jnp.where(mask.astype(bool), nll, -jnp.inf)
    flat = nll.reshape(-1)
    num_voxels = flat.shape[0]
    k = max(1, int(num_voxels * k_percent / 100))
    top, _ = jax.lax.top_k(flat, k)
    top = jnp.where(jnp.isfinite(top), top, 0.0)
    denom = jnp.sum(jnp.isfinite(top)) if mask is not None else k
    return top.sum() / jnp.clip(denom, 1)
