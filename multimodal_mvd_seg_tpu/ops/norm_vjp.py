"""Instance norm (+ leaky relu) with a hand-written VJP.

WHY. The train step of the 3d_fullres U-Net is HBM-bandwidth-bound in the
two full-resolution stages (documentation/tpu_performance.md). Offline
attribution of the TPU-compiled step (batch_running/hlo_bytes.py over the
scheduled HLO) shows the norm is the biggest *removable* byte source: with
the norm written as plain jnp + ``jax.checkpoint``, XLA materializes
full-size f32 copies of the activation around the checkpoint boundary
(~1 GB each at stage 0 / dec4: `copy f32[2,128,32,64,256]` rows with
`convert_element_type` / `checkpoint/rematted_computation` metadata) and
re-runs the forward normalization inside the rematted backward.

This module removes both costs by giving the norm an explicit custom VJP:

- forward: one reduce fusion (reads bf16 x once, f32 accumulation) + one
  elementwise fusion ``y = leaky(x*A + B)`` with per-(batch, channel)
  coefficients (reads bf16 x, writes bf16 y);
- residuals: the bf16 input plus O(B*C) f32 statistics — exactly what the
  old ``jax.checkpoint`` kept, with no remat boundary for XLA to
  canonicalize layouts around;
- backward: one reduce fusion over (dy, x) producing the two sufficient
  statistics S1 = Σ dŷ, S2 = Σ dŷ·x (the leaky-relu mask is recomputed
  in-register from x) + one elementwise fusion
  ``dx = c1·dŷ + c2·x + c3`` — again only bf16 tensors touch HBM.

The same code covers the plain channels-first norm (models/blocks.py) and
the s2d cell-domain masked norm (ops/s2d.py): the s2d case groups channels
as C×F, excludes phase-artifact rows from the statistics via the
structural mask, and corrects the count. Numerics of the forward are
bit-identical to the previous implementations; the backward computes the
textbook instance-norm gradient (tests/test_norm_vjp.py pins both against
autodiff of the reference formulation).

Reference correspondence: the reference stack's InstanceNorm3d+LeakyReLU
(nnU-Net conv blocks via dynamic_network_architectures; consumed by
/root/reference/nnUNet/nnunetv2/utilities/get_network_from_plans.py) —
this is its TPU execution, not a translation.
"""

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class _Cfg(NamedTuple):
    """Static (hashable) configuration of one norm call."""
    rep: Optional[Tuple[Tuple[int, int], ...]]  # s2d rep; None = plain CF
    layout: str       # "NC" | "NL" (cell layout when rep is not None)
    act: bool
    eps: float
    slope: float
    has_scale: bool
    has_bias: bool


def _grouping(cfg: _Cfg, x):
    """-> (xg, red_axes, msk_or_None, n_norm, B, C, coeff_shape).

    xg is a reshaped VIEW of x grouping the channel axis as (C, F):
      NC: (B, C, F, *cells), reduce over (2..);
      NL: (B, *cells, C, F), reduce over cells + last.
    msk broadcasts against xg and zeroes phase-artifact rows; n_norm is the
    real-voxel count per (B, C) statistic.
    """
    if cfg.rep is None:
        B, C = x.shape[:2]
        xg = x
        red = tuple(range(2, x.ndim))
        n = 1
        for a in red:
            n *= x.shape[a]
        return xg, red, None, n, B, C, (B, C) + (1,) * (x.ndim - 2)
    from . import s2d as _s2d
    nl = cfg.layout == "NL"
    B = x.shape[0]
    CF = x.shape[-1] if nl else x.shape[1]
    cells = x.shape[1:-1] if nl else x.shape[2:]
    F = _s2d.rep_F(cfg.rep)
    C = CF // F
    if nl:
        xg = x.reshape(B, *cells, C, F)
        red = tuple(range(1, 1 + len(cells))) + (xg.ndim - 1,)
        cshape = (B,) + (1,) * len(cells) + (C, 1)
    else:
        xg = x.reshape(B, C, F, *cells)
        red = tuple(range(2, xg.ndim))
        cshape = (B, C) + (1,) * (xg.ndim - 2)
    needs_mask = any(f > 1 and p for f, p in cfg.rep)
    if needs_mask:
        msk, n_real = _s2d.artifact_mask(cfg.rep, cells)  # (F, *cells)
        if nl:
            msk = jnp.moveaxis(msk, 0, -1)[None, ..., None, :]
        else:
            msk = msk[None, None]
        return xg, red, msk, n_real, B, C, cshape
    n = F
    for L in cells:
        n *= L
    return xg, red, None, n, B, C, cshape


def _stats(cfg: _Cfg, xg, red, msk, n):
    """Per-(B, C) mean and rsqrt(var + eps), f32, mask-corrected."""
    xf = xg.astype(jnp.float32)
    if msk is not None:
        xf = xf * msk
        mean = xf.sum(axis=red) / n
        var = jnp.square(xf).sum(axis=red) / n - jnp.square(mean)
    else:
        mean = xf.mean(axis=red)
        var = jnp.square(xf).mean(axis=red) - jnp.square(mean)
    return mean, jax.lax.rsqrt(var + cfg.eps)


def _coeffs(cfg: _Cfg, mean, r, scale, bias):
    """y = x*A + B_ coefficients, f32 (B, C)."""
    a, b = r, -mean * r
    if cfg.has_scale:
        s = scale.astype(jnp.float32)[None, :]
        a, b = a * s, b * s
    if cfg.has_bias:
        b = b + bias.astype(jnp.float32)[None, :]
    return a, b


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _norm_act(cfg: _Cfg, x, scale, bias):
    y, _ = _norm_act_fwd(cfg, x, scale, bias)
    return y


def _norm_act_fwd(cfg: _Cfg, x, scale, bias):
    xg, red, msk, n, B, C, cshape = _grouping(cfg, x)
    mean, r = _stats(cfg, xg, red, msk, n)
    a, b = _coeffs(cfg, mean, r, scale, bias)
    y = xg.astype(jnp.float32) * a.reshape(cshape) + b.reshape(cshape)
    if cfg.act:
        y = jax.nn.leaky_relu(y, negative_slope=cfg.slope)
    if msk is not None:
        y = y * msk
    y = y.reshape(x.shape).astype(x.dtype)
    return y, (x, scale, bias, mean, r)


def _norm_act_bwd(cfg: _Cfg, res, dy):
    x, scale, bias, mean, r = res
    xg, red, msk, n, B, C, cshape = _grouping(cfg, x)
    a, b = _coeffs(cfg, mean, r, scale, bias)
    ac, bc = a.reshape(cshape), b.reshape(cshape)
    dyg = dy.reshape(xg.shape).astype(jnp.float32)
    xf = xg.astype(jnp.float32)

    def dy_pre_of(xf, dyg):
        # recomputed in-register inside both consumer fusions
        g = dyg
        if cfg.act:
            pre = xf * ac + bc
            g = g * jnp.where(pre >= 0, 1.0, cfg.slope)
        if msk is not None:
            g = g * msk
        return g

    g = dy_pre_of(xf, dyg)
    s1 = g.sum(axis=red)                    # (B, C) f32
    s2 = (g * xf).sum(axis=red)             # (B, C) f32

    # parameter gradients: y_pre = x̂·s + bias, x̂ = (x−m)·r
    d_bias = s1.sum(axis=0) if cfg.has_bias else None
    d_scale = (r * (s2 - mean * s1)).sum(axis=0) if cfg.has_scale else None

    # dx = r·(ĝ − mean(ĝ) − x̂·mean(ĝ·x̂)) with ĝ = dy_pre·s, expressed as
    # an affine form in (dy_pre, x) with per-(B, C) coefficients.
    s = scale.astype(jnp.float32)[None, :] if cfg.has_scale else 1.0
    c1 = r * s                                       # · dy_pre
    c2 = -(r ** 3) * s * (s2 - mean * s1) / n        # · x
    c3 = -r * s * s1 / n - mean * c2                 # constant
    dx = dy_pre_of(xf, dyg) * c1.reshape(cshape) + xf * c2.reshape(cshape) \
        + c3.reshape(cshape)
    if msk is not None:
        dx = dx * msk
    dx = dx.reshape(x.shape).astype(x.dtype)
    zs = jnp.zeros_like(scale) if scale is not None else None
    zb = jnp.zeros_like(bias) if bias is not None else None
    return (dx,
            d_scale.astype(scale.dtype) if cfg.has_scale else zs,
            d_bias.astype(bias.dtype) if cfg.has_bias else zb)


_norm_act.defvjp(_norm_act_fwd, _norm_act_bwd)


def instance_norm_act(x, *, rep=None, layout: str = "NC", scale=None,
                      bias=None, act: bool = True, eps: float = 1e-5,
                      slope: float = 0.01):
    """Instance norm (+ leaky relu) with the custom VJP above.

    rep None: x is (B, C, *spatial) channels-first.
    rep set (ops/s2d.py Rep): x is an s2d cell tensor, (B, C*F, *cells) for
    layout "NC" or (B, *cells, C*F) for "NL"; statistics are per LOGICAL
    channel with phase-artifact rows excluded and the count corrected.
    """
    cfg = _Cfg(tuple(rep) if rep is not None else None, layout, bool(act),
               float(eps), float(slope), scale is not None, bias is not None)
    # custom_vjp needs array placeholders for absent affine params; zero
    # gradients flow into these throwaway constants.
    if scale is None or bias is None:
        C = x.shape[1] if (rep is None or layout == "NC") else x.shape[-1]
        if rep is not None:
            from . import s2d as _s2d
            C //= _s2d.rep_F(rep)
        if scale is None:
            scale = jnp.zeros((C,), jnp.float32)
        if bias is None:
            bias = jnp.zeros((C,), jnp.float32)
    return _norm_act(cfg, x, scale, bias)
