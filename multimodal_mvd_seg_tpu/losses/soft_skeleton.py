"""Differentiable soft morphology / skeletonization + soft-clDice loss.

Parity: reference training/loss/soft_skeleton.py:6-37 (min/max-pool based
erode/dilate/open/skeletonize for 2D and 3D), the clDice building block.
Channels-last (B, *spatial, C); min-pool expressed as -maxpool(-x); all ops
are pure jittable XLA reduce-windows (they fuse well on TPU).
"""

import jax
import jax.numpy as jnp


def _max_pool(x: jnp.ndarray, window) -> jnp.ndarray:
    """SAME max-pool, stride 1, over the spatial axes of (B, *sp, C)."""
    dims = (1, *window, 1)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims,
                                 (1,) * x.ndim, "SAME")


def soft_erode(img: jnp.ndarray) -> jnp.ndarray:
    """Min over the 3 (2 in 2D) axis-aligned 3-neighborhoods
    (reference soft_skeleton.py:6-16)."""
    nd = img.ndim - 2
    pools = []
    for ax in range(nd):
        w = [1] * nd
        w[ax] = 3
        pools.append(-_max_pool(-img, w))
    out = pools[0]
    for p in pools[1:]:
        out = jnp.minimum(out, p)
    return out


def soft_dilate(img: jnp.ndarray) -> jnp.ndarray:
    nd = img.ndim - 2
    return _max_pool(img, [3] * nd)


def soft_open(img: jnp.ndarray) -> jnp.ndarray:
    return soft_dilate(soft_erode(img))


def soft_skel(img: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """Iterative morphological soft skeleton (reference :29-37)."""
    img1 = soft_open(img)
    skel = jax.nn.relu(img - img1)
    for _ in range(iterations):
        img = soft_erode(img)
        img1 = soft_open(img)
        delta = jax.nn.relu(img - img1)
        skel = skel + jax.nn.relu(delta - skel * delta)
    return skel


def soft_cldice_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     iterations: int = 3, smooth: float = 1.0) -> jnp.ndarray:
    """soft-clDice (Shit et al., CVPR'21) on probability maps (B, *sp) or
    (B, *sp, 1): 1 − 2·tprec·tsens/(tprec+tsens) with topology precision /
    sensitivity computed from soft skeletons."""
    # normalize both to an explicit trailing channel axis: soft_erode
    # infers spatial rank as ndim-2, so a missing channel axis would run
    # the morphology one dimension short
    if pred.ndim == target.ndim + 1:
        target = target[..., None]
    elif pred.ndim != target.ndim:
        raise ValueError(f"pred/target rank mismatch: {pred.shape} vs "
                         f"{target.shape}")
    if pred.shape[-1] != 1:
        pred = pred[..., None]
        target = target[..., None]
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    skel_p = soft_skel(pred, iterations)
    skel_t = soft_skel(target, iterations)
    tprec = ((skel_p * target).sum() + smooth) / (skel_p.sum() + smooth)
    tsens = ((skel_t * pred).sum() + smooth) / (skel_t.sum() + smooth)
    return 1.0 - 2.0 * tprec * tsens / (tprec + tsens)
