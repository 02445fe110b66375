"""On-device, fully jittable training augmentation.

TPU-native replacement for the reference's batchgenerators CPU worker-pool
pipeline (transform parameters mirror nnUNetTrainer.get_training_transforms,
reference :678-770):

- SpatialTransform: per-sample rotation (p=0.2, ±30° each axis; dummy-2d mode
  ±180° in-plane) + scaling (p=0.2, 0.7–1.4), fused into ONE affine
  gather per sample (single linear resample for data, nearest for seg),
  which simultaneously center-crops the enlarged sampling patch to the
  final patch size.
- GaussianNoise (p=0.1, var 0–0.1), GaussianBlur (p=0.2, σ 0.5–1.0,
  per-channel p=0.5), multiplicative brightness (p=0.15, 0.75–1.25),
  contrast (p=0.15, 0.75–1.25), simulated low resolution (p=0.25, zoom
  0.5–1, per-channel p=0.5), gamma inverted (p=0.1) and gamma (p=0.3,
  γ 0.7–1.5, retain stats), mirroring (p=0.5 per axis).

Everything is traced once and fused by XLA; there are no host round-trips and
no dynamic shapes (the low-res zoom is expressed in coordinate arithmetic, not
array shapes).

Data layout: CHANNELS-FIRST internally — data (b, c, *spatial) float32, seg
(b, *spatial) int32 (label -1 = outside region). TPU tiles the last two axes
(8 sublanes x 128 lanes); with channels LAST a 2-channel MRI patch pads
2 -> 128 lanes and every elementwise op in this pipeline pays a 64x memory
blowup — measured 591 ms of a 1.5 s flagship MVD step. Channel-leading keeps
the last two axes spatial (well-tiled). ``augment_batch(..,
channels_first=False)`` keeps the legacy (b, *spatial, c) contract by
transposing at the boundary; the random draws are identical in both modes.

Execution modes (``mode=`` / env ``MVDSEG_AUG_MODE``):

- "gated" (default): ``lax.scan`` over the batch with a real ``lax.cond``
  around every expensive transform, so an untriggered transform costs
  nothing at runtime. The reference pipeline's trigger probabilities are
  low (rot/scale 0.2, blur 0.2, lowres 0.25, gamma 0.1/0.3, noise 0.1),
  but the original vmap formulation executed EVERY transform every step
  and selected with ``jnp.where`` (vmap lowers cond to select) — measured
  617 ms of the flagship MVD step for an expected useful fraction of
  ~30%. The untriggered spatial path is a static center-slice (+ fixed
  half-voxel blend when the crop offset is fractional) instead of the
  8-corner trilinear gather. Results match "vmap" mode to float-assoc
  tolerance; the random DRAWS are identical (same per-sample key tree).
- "vmap": the original fully-batched formulation (kept for A/B and for
  very large 2D batches, where it is also the automatic fallback).

Under a >1-device mesh pass ``mesh=`` so the gated scan runs per-shard
inside ``shard_map`` (each device branches on its own samples; no
cross-device predicate rendezvous)."""

import os
from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class AugmentConfig(NamedTuple):
    patch_size: Tuple[int, ...]           # final patch size after spatial aug
    rotation: Tuple[float, float] = (-np.pi / 6, np.pi / 6)
    p_rotation: float = 0.2
    scale_range: Tuple[float, float] = (0.7, 1.4)
    p_scale: float = 0.2
    p_noise: float = 0.1
    noise_var: Tuple[float, float] = (0.0, 0.1)
    p_blur: float = 0.2
    blur_sigma: Tuple[float, float] = (0.5, 1.0)
    p_blur_per_channel: float = 0.5
    p_brightness: float = 0.15
    brightness_range: Tuple[float, float] = (0.75, 1.25)
    p_contrast: float = 0.15
    contrast_range: Tuple[float, float] = (0.75, 1.25)
    p_lowres: float = 0.25
    lowres_zoom: Tuple[float, float] = (0.5, 1.0)
    p_lowres_per_channel: float = 0.5
    p_gamma_invert: float = 0.1
    p_gamma: float = 0.3
    gamma_range: Tuple[float, float] = (0.7, 1.5)
    mirror_axes: Tuple[int, ...] = (0, 1, 2)
    do_dummy_2d: bool = False
    interp_order: int = 1   # data interpolation of the spatial warp (DAOrd0→0)
    # ---- DA5-specific fields (all default-off/neutral so the base pipeline's
    # draw stream and numerics are unchanged; reference
    # variants/data_augmentation/nnUNetTrainerDA5.py:110-265). Draws for
    # these are folded in from separate keys, never taken from the base
    # pipeline's key tree.
    p_rot_per_axis: float = 1.0        # gate each rotation axis (DA5: 0.5)
    independent_scale: bool = False    # per-axis scale factors (DA5: True)
    p_rot90: float = 0.0               # Rot90Transform over matching axes
    rot90_axes: Tuple[Tuple[int, int], ...] = ()   # ordered axis pairs
    p_transpose: float = 0.0           # TransposeAxesTransform
    transpose_axes: Tuple[int, ...] = ()           # equal-size axes
    median_oneof_blur: bool = False    # OneOf([median, blur]) coupling
    p_median: float = 0.0              # MedianFilterTransform
    median_size: Tuple[int, int] = (2, 8)          # randint [lo, hi)
    p_median_per_channel: float = 0.5
    p_brightness_additive: float = 0.0  # BrightnessTransform(0, sigma)
    brightness_additive_sigma: float = 0.5
    p_brightness_additive_per_channel: float = 0.5
    p_contrast_preserve: float = 1.0   # OneOf(preserve_range True/False)
    p_contrast_per_channel: float = 1.0
    gamma_second_invert: bool = False  # DA5's 2nd gamma is ALSO inverted
    p_blank_rect: float = 0.0          # BlankRectangleTransform
    blank_rect_num: Tuple[int, int] = (1, 5)       # randint [lo, hi)
    p_blank_rect_per_channel: float = 0.5
    p_bright_grad: float = 0.0         # BrightnessGradientAdditiveTransform
    p_bright_grad_per_channel: float = 0.5
    p_local_gamma: float = 0.0         # LocalGammaTransform
    p_local_gamma_per_channel: float = 0.5
    p_sharpen: float = 0.0             # SharpeningTransform
    sharpen_strength: Tuple[float, float] = (0.1, 1.0)
    p_sharpen_per_channel: float = 0.5


def _rot3(kx, ky, kz):
    cx, sx = jnp.cos(kx), jnp.sin(kx)
    cy, sy = jnp.cos(ky), jnp.sin(ky)
    cz, sz = jnp.cos(kz), jnp.sin(kz)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def _rot2(k):
    c, s = jnp.cos(k), jnp.sin(k)
    return jnp.array([[c, -s], [s, c]])


def _affine_params(key, cfg: AugmentConfig):
    """Per-sample spatial draws (cheap scalars, always evaluated so the
    random stream is identical in gated and vmap modes)."""
    k_rot, k_ang, k_scl, k_sfac = jax.random.split(key, 4)
    do_rot = jax.random.uniform(k_rot) < cfg.p_rotation
    angles = jax.random.uniform(k_ang, (3,), minval=cfg.rotation[0],
                                maxval=cfg.rotation[1])
    angles = jnp.where(do_rot, angles, jnp.zeros(3))
    if cfg.p_rot_per_axis < 1.0:
        # DA5's p_rot_per_axis: each axis' rotation gated individually
        per_axis = jax.random.uniform(jax.random.fold_in(k_rot, 1),
                                      (3,)) < cfg.p_rot_per_axis
        angles = jnp.where(per_axis, angles, 0.0)
    do_scale = jax.random.uniform(k_scl) < cfg.p_scale
    if cfg.independent_scale:
        # DA5's independent_scale_for_each_axis
        scale = jax.random.uniform(k_sfac, (3,), minval=cfg.scale_range[0],
                                   maxval=cfg.scale_range[1])
        scale = jnp.where(do_scale, scale, jnp.ones(3))
    else:
        scale = jax.random.uniform(k_sfac, (), minval=cfg.scale_range[0],
                                   maxval=cfg.scale_range[1])
        scale = jnp.where(do_scale, scale, 1.0)
    return do_rot, angles, do_scale, scale


def _affine_coords_from(angles, scale, in_shape, out_shape,
                        cfg: AugmentConfig):
    """Sampling coordinates in the input patch for every output voxel:
    rotation+scale about the center."""
    dim = len(out_shape)
    if dim == 3:
        if cfg.do_dummy_2d:
            # rotate only in-plane (axes 1,2), full ±180° handled by cfg.rotation
            mat = _rot3(angles[0], 0.0, 0.0)
        else:
            mat = _rot3(angles[0], angles[1], angles[2])
    else:
        mat = _rot2(angles[0])
    # scaling < 1 zooms IN in batchgenerators convention (coordinates * scale)
    if jnp.ndim(scale) == 1:
        # per-axis scale applies to the rotated sampling coordinates
        # (batchgenerators scale_coords: diag(scale) @ R)
        mat = scale[:dim, None] * mat
    else:
        mat = mat * scale

    grids = jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) -
                           (s - 1) / 2 for s in out_shape], indexing="ij")
    pts = jnp.stack([g.reshape(-1) for g in grids], 0)          # (dim, N)
    pts = mat @ pts                                             # rotate+scale
    centers = jnp.array([(s - 1) / 2 for s in in_shape], jnp.float32)
    coords = pts + centers[:, None]
    return coords.reshape(dim, *out_shape)


def _map_coords(volume, coords, order: int):
    return jax.scipy.ndimage.map_coordinates(volume, list(coords), order=order,
                                             mode="nearest")


def _identity_resample(vol, out_shape, order: int):
    """Center-aligned crop of ``vol`` to ``out_shape`` matching
    map_coordinates at identity coordinates: the per-axis offset
    (in - out)/2 is static, so this is a slice when integral and a fixed
    half-voxel blend of two slices (order 1) / a static round-half-even
    gather (order 0) when fractional — no 2^dim-corner gather."""
    for ax, (si, so) in enumerate(zip(vol.shape, out_shape)):
        if si == so:
            continue
        off = (si - so) / 2.0
        i = np.arange(so, dtype=np.float64) + off
        if order == 0:
            # jax map_coordinates rounds half AWAY FROM ZERO (lax.round),
            # not numpy's half-to-even
            r = np.where(i >= 0, np.floor(i + 0.5), np.ceil(i - 0.5))
            idx = np.clip(r, 0, si - 1).astype(np.int32)
            vol = jnp.take(vol, jnp.asarray(idx), axis=ax)
        else:
            f = np.floor(i)
            t = float(i[0] - f[0])
            lo = int(f[0])
            if t == 0.0:
                vol = jax.lax.slice_in_dim(vol, lo, lo + so, axis=ax)
            else:
                v0 = jax.lax.slice_in_dim(vol, lo, lo + so, axis=ax)
                v1 = jax.lax.slice_in_dim(vol, lo + 1, lo + 1 + so, axis=ax)
                vol = (1.0 - t) * v0 + t * v1
    return vol


def _spatial_one(key, data, seg, cfg: AugmentConfig):
    """data (c, *spatial), seg (*spatial)."""
    in_shape = seg.shape
    _, angles, _, scale = _affine_params(key, cfg)
    coords = _affine_coords_from(angles, scale, in_shape, cfg.patch_size, cfg)
    data_out = jax.vmap(lambda v: _map_coords(v, coords, cfg.interp_order))(
        data)
    seg_out = _map_coords(seg.astype(jnp.float32), coords, 0).astype(jnp.int32)
    return data_out, seg_out


def _spatial_one_gated(key, data, seg, cfg: AugmentConfig):
    """Gated spatial transform: full affine gather only when rotation or
    scaling triggered; static center-slice otherwise."""
    in_shape = seg.shape
    do_rot, angles, do_scale, scale = _affine_params(key, cfg)

    def identity(operand):
        d, s = operand
        d2 = jax.vmap(lambda v: _identity_resample(
            v, cfg.patch_size, cfg.interp_order))(d)
        s2 = _identity_resample(s, cfg.patch_size, 0)
        return d2.astype(d.dtype), s2

    if cfg.p_rotation <= 0 and cfg.p_scale <= 0:
        return identity((data, seg))

    def warp(operand):
        d, s = operand
        coords = _affine_coords_from(angles, scale, in_shape,
                                     cfg.patch_size, cfg)
        d2 = jax.vmap(lambda v: _map_coords(v, coords, cfg.interp_order))(d)
        s2 = _map_coords(s.astype(jnp.float32), coords, 0).astype(jnp.int32)
        return d2, s2

    return jax.lax.cond(do_rot | do_scale, warp, identity, (data, seg))


def _gauss_kernel(sigma, radius: int):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-4)) ** 2)
    return k / k.sum()


def _blur_axis(x, kernel, axis):
    """Separable 1D convolution along `axis` of a (*spatial,) volume."""
    moved = jnp.moveaxis(x, axis, -1)
    shp = moved.shape
    flat = moved.reshape(-1, 1, shp[-1])
    out = jax.lax.conv_general_dilated(
        flat, kernel[None, None, :], window_strides=(1,),
        padding=[(kernel.shape[0] // 2, kernel.shape[0] // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    return jnp.moveaxis(out.reshape(shp), -1, axis)


def _blur_radius(cfg: AugmentConfig) -> int:
    # 3 covers the default sigma ≤ 1.0 (<1e-3 tail); wider ranges (DA5's
    # 1.5) get 3σ coverage
    return 3 if cfg.blur_sigma[1] <= 1.0 else int(np.ceil(3 * cfg.blur_sigma[1]))


def _gaussian_blur_one(key, data, cfg: AugmentConfig, suppress=None):
    """suppress: optional traced bool that vetoes the blur (the DA5
    OneOf([median, blur]) coupling — exactly one of the pair may fire)."""
    dim = data.ndim - 1
    k_do, k_sig, k_ch = jax.random.split(key, 3)
    do = jax.random.uniform(k_do) < cfg.p_blur
    if suppress is not None:
        do = do & ~suppress
    sigma = jax.random.uniform(k_sig, (data.shape[0],),
                               minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1])
    per_ch = jax.random.uniform(k_ch, (data.shape[0],)) < cfg.p_blur_per_channel
    radius = _blur_radius(cfg)

    def blur_channel(vol, s):
        kern = _gauss_kernel(s, radius)
        for ax in range(dim):
            vol = _blur_axis(vol, kern, ax)
        return vol

    blurred = jax.vmap(blur_channel)(data, sigma)
    use = do & per_ch
    return jnp.where(use.reshape((-1,) + (1,) * dim), blurred, data)


def _median_one(key, data, cfg: AugmentConfig, choose_median, gated: bool):
    """MedianFilterTransform half of the DA5 OneOf: per-channel EXACT
    dense median with size ~ randint(*cfg.median_size) (scipy-parity
    pinned in tests/test_augment.py)."""
    C = data.shape[0]
    dim = data.ndim - 1
    km = jax.random.fold_in(key, 78)
    do = choose_median & (jax.random.uniform(jax.random.fold_in(km, 0))
                          < cfg.p_median)
    per_ch = jax.random.uniform(jax.random.fold_in(km, 1),
                                (C,)) < cfg.p_median_per_channel
    sizes = jax.random.randint(jax.random.fold_in(km, 2), (C,), 0,
                               cfg.median_size[1] - cfg.median_size[0])

    def apply(d):
        out = jax.vmap(lambda v, si: _median_channel(v, si, cfg))(d, sizes)
        return jnp.where(per_ch.reshape((-1,) + (1,) * dim), out, d)

    return _cond(do, apply, data) if gated \
        else jnp.where(do, apply(data), data)


def _brightness_additive(keys4, data, cfg: AugmentConfig):
    """DA5's BrightnessTransform(0, sigma, per_channel): add a per-channel
    N(0, sigma) shift. One fused where — no cond needed."""
    dim = data.ndim - 1
    C = data.shape[0]
    kb = jax.random.fold_in(keys4, 5)
    do = jax.random.uniform(jax.random.fold_in(kb, 0)) \
        < cfg.p_brightness_additive
    per_ch = jax.random.uniform(jax.random.fold_in(kb, 1), (C,)) \
        < cfg.p_brightness_additive_per_channel
    shift = jax.random.normal(jax.random.fold_in(kb, 2), (C,)) \
        * cfg.brightness_additive_sigma
    add = jnp.where(per_ch, shift, 0.0).reshape((-1,) + (1,) * dim)
    return jnp.where(do, data + add, data)


def _contrast_extras(keys5, data, cfg: AugmentConfig):
    """DA5 contrast options: 50/50 preserve-range OneOf, per-channel gating
    and per-channel factors. Returns (preserve, ch_on, cfac_per_ch) —
    None where the base behavior applies."""
    preserve = ch_on = cfac_ch = None
    C = data.shape[0]
    if cfg.p_contrast_preserve < 1.0:
        preserve = jax.random.uniform(jax.random.fold_in(keys5, 1)) \
            < cfg.p_contrast_preserve
    if cfg.p_contrast_per_channel < 1.0:
        ch_on = jax.random.uniform(jax.random.fold_in(keys5, 2), (C,)) \
            < cfg.p_contrast_per_channel
        cfac_ch = jax.random.uniform(jax.random.fold_in(keys5, 3), (C,),
                                     minval=cfg.contrast_range[0],
                                     maxval=cfg.contrast_range[1])
    return preserve, ch_on, cfac_ch


def _lowres_axis(x, zoom, axis, size):
    """Simulate order-0 downsample + linear upsample along one axis using
    coordinate arithmetic only (no dynamic shapes). zoom is traced."""
    m = jnp.maximum(jnp.round(size * zoom), 1.0)       # low-res length
    i = jnp.arange(size, dtype=jnp.float32)
    xl = (i + 0.5) * m / size - 0.5                    # coordinate in lowres grid
    j0 = jnp.floor(xl)
    t = xl - j0
    # nearest original index of lowres sample j: round((j + 0.5) * size/m - 0.5)
    def orig(j):
        return jnp.clip(jnp.round((j + 0.5) * size / m - 0.5), 0, size - 1
                        ).astype(jnp.int32)
    idx0, idx1 = orig(j0), orig(j0 + 1)
    moved = jnp.moveaxis(x, axis, 0)
    out = (1 - t).reshape(-1, *([1] * (moved.ndim - 1))) * moved[idx0] + \
        t.reshape(-1, *([1] * (moved.ndim - 1))) * moved[idx1]
    return jnp.moveaxis(out, 0, axis)


def _lowres_one(key, data, cfg: AugmentConfig):
    dim = data.ndim - 1
    k_do, k_z, k_ch = jax.random.split(key, 3)
    do = jax.random.uniform(k_do) < cfg.p_lowres
    zoom = jax.random.uniform(k_z, (data.shape[0],),
                              minval=cfg.lowres_zoom[0], maxval=cfg.lowres_zoom[1])
    per_ch = jax.random.uniform(k_ch, (data.shape[0],)) < cfg.p_lowres_per_channel

    def lr_channel(vol, z):
        for ax in range(dim):
            vol = _lowres_axis(vol, z, ax, vol.shape[ax])
        return vol

    low = jax.vmap(lr_channel)(data, zoom)
    use = do & per_ch
    return jnp.where(use.reshape((-1,) + (1,) * dim), low, data)


def _gamma_one(key, data, cfg: AugmentConfig, invert: bool, p: float):
    k_do, k_g = jax.random.split(key)
    do = jax.random.uniform(k_do) < p
    gamma = jax.random.uniform(k_g, (), minval=cfg.gamma_range[0],
                               maxval=cfg.gamma_range[1])
    x = -data if invert else data
    mn = x.min()
    rng_ = jnp.maximum(x.max() - mn, 1e-7)
    mean, std = x.mean(), x.std()
    y = jnp.power((x - mn) / rng_, gamma) * rng_ + mn
    # retain_stats=True in the reference pipeline
    y = (y - y.mean()) / jnp.maximum(y.std(), 1e-7) * std + mean
    y = -y if invert else y
    return jnp.where(do, y, data)


def _intensity_one(key, data, cfg: AugmentConfig):
    """data (c, *spatial)."""
    keys = jax.random.split(key, 10)
    # gaussian noise
    do_noise = jax.random.uniform(keys[0]) < cfg.p_noise
    var = jax.random.uniform(keys[1], (), minval=cfg.noise_var[0],
                             maxval=cfg.noise_var[1])
    noise = jax.random.normal(keys[2], data.shape) * jnp.sqrt(var)
    data = jnp.where(do_noise, data + noise, data)
    # median / blur (DA5 couples them in a OneOf: exactly one may fire)
    choose_median = None
    if cfg.median_oneof_blur and cfg.p_median > 0:
        choose_median = jax.random.uniform(
            jax.random.fold_in(keys[3], 77)) < 0.5
        data = _median_one(keys[3], data, cfg, choose_median, gated=False)
    data = _gaussian_blur_one(keys[3], data, cfg, suppress=choose_median)
    # brightness (multiplicative; DA5 uses the additive form instead)
    do_b = jax.random.uniform(keys[4]) < cfg.p_brightness
    bfac = jax.random.uniform(keys[8], (), minval=cfg.brightness_range[0],
                              maxval=cfg.brightness_range[1])
    data = jnp.where(do_b, data * bfac, data)
    if cfg.p_brightness_additive > 0:
        data = _brightness_additive(keys[4], data, cfg)
    # contrast (preserve range; DA5 adds preserve OneOf + per-channel gates)
    do_c = jax.random.uniform(keys[5]) < cfg.p_contrast
    cfac = jax.random.uniform(keys[9], (), minval=cfg.contrast_range[0],
                              maxval=cfg.contrast_range[1])
    preserve, ch_on, cfac_ch = _contrast_extras(keys[5], data, cfg)
    if cfac_ch is not None:
        cfac = cfac_ch.reshape((-1,) + (1,) * (data.ndim - 1))
    axes = tuple(range(1, data.ndim))  # per-channel stats over spatial
    mean = data.mean(axis=axes, keepdims=True)
    mn = data.min(axis=axes, keepdims=True)
    mx = data.max(axis=axes, keepdims=True)
    contrasted = (data - mean) * cfac + mean
    clipped = jnp.clip(contrasted, mn, mx)
    contrasted = clipped if preserve is None \
        else jnp.where(preserve, clipped, contrasted)
    if ch_on is not None:
        contrasted = jnp.where(
            ch_on.reshape((-1,) + (1,) * (data.ndim - 1)), contrasted, data)
    data = jnp.where(do_c, contrasted, data)
    # simulate low res
    data = _lowres_one(keys[6], data, cfg)
    # gamma (inverted then normal, reference order :742-752; DA5's second
    # gamma is also inverted)
    k_g1, k_g2 = jax.random.split(keys[7])
    data = _gamma_one(k_g1, data, cfg, invert=True, p=cfg.p_gamma_invert)
    data = _gamma_one(k_g2, data, cfg, invert=cfg.gamma_second_invert,
                      p=cfg.p_gamma)
    return data


def _mirror_one(key, data, seg, cfg: AugmentConfig):
    dim = data.ndim - 1
    flips = jax.random.uniform(key, (len(cfg.mirror_axes),)) < 0.5
    for i, ax in enumerate(cfg.mirror_axes):
        if ax >= dim:
            continue
        data = jnp.where(flips[i], jnp.flip(data, axis=ax + 1), data)
        seg = jnp.where(flips[i], jnp.flip(seg, axis=ax), seg)
    return data, seg


def _cond(pred, fn, x):
    """lax.cond that only pays for ``fn`` when taken (x unchanged else)."""
    return jax.lax.cond(pred, fn, lambda v: v, x)


def _intensity_one_gated(key, data, cfg: AugmentConfig):
    """Same draws and taken-branch math as _intensity_one, with every
    expensive transform under a real lax.cond."""
    dim = data.ndim - 1
    keys = jax.random.split(key, 10)

    # gaussian noise (p_noise): the normal draw itself is the cost
    if cfg.p_noise > 0:
        do_noise = jax.random.uniform(keys[0]) < cfg.p_noise
        var = jax.random.uniform(keys[1], (), minval=cfg.noise_var[0],
                                 maxval=cfg.noise_var[1])
        data = _cond(do_noise,
                     lambda d: d + jax.random.normal(keys[2], d.shape)
                     * jnp.sqrt(var), data)

    # median / blur (DA5 couples them in a OneOf: exactly one may fire)
    choose_median = None
    if cfg.median_oneof_blur and cfg.p_median > 0:
        choose_median = jax.random.uniform(
            jax.random.fold_in(keys[3], 77)) < 0.5
        data = _median_one(keys[3], data, cfg, choose_median, gated=True)

    # blur: 3 separable convs per channel
    if cfg.p_blur > 0:
        k_do, k_sig, k_ch = jax.random.split(keys[3], 3)
        do = jax.random.uniform(k_do) < cfg.p_blur
        if choose_median is not None:
            do = do & ~choose_median
        sigma = jax.random.uniform(k_sig, (data.shape[0],),
                                   minval=cfg.blur_sigma[0],
                                   maxval=cfg.blur_sigma[1])
        per_ch = jax.random.uniform(k_ch, (data.shape[0],)) \
            < cfg.p_blur_per_channel
        radius = _blur_radius(cfg)

        def blur(d):
            def blur_channel(vol, s):
                kern = _gauss_kernel(s, radius)
                for ax in range(dim):
                    vol = _blur_axis(vol, kern, ax)
                return vol
            blurred = jax.vmap(blur_channel)(d, sigma)
            return jnp.where(per_ch.reshape((-1,) + (1,) * dim), blurred, d)

        data = _cond(do, blur, data)

    # brightness: one scalar multiply — not worth a cond
    do_b = jax.random.uniform(keys[4]) < cfg.p_brightness
    bfac = jax.random.uniform(keys[8], (), minval=cfg.brightness_range[0],
                              maxval=cfg.brightness_range[1])
    data = jnp.where(do_b, data * bfac, data)
    if cfg.p_brightness_additive > 0:
        data = _brightness_additive(keys[4], data, cfg)

    # contrast: 3 reductions + clip
    if cfg.p_contrast > 0:
        do_c = jax.random.uniform(keys[5]) < cfg.p_contrast
        cfac = jax.random.uniform(keys[9], (), minval=cfg.contrast_range[0],
                                  maxval=cfg.contrast_range[1])
        preserve, ch_on, cfac_ch = _contrast_extras(keys[5], data, cfg)
        if cfac_ch is not None:
            cfac = cfac_ch.reshape((-1,) + (1,) * dim)

        def contrast(d):
            axes = tuple(range(1, d.ndim))
            mean = d.mean(axis=axes, keepdims=True)
            mn = d.min(axis=axes, keepdims=True)
            mx = d.max(axis=axes, keepdims=True)
            out = (d - mean) * cfac + mean
            clipped = jnp.clip(out, mn, mx)
            out = clipped if preserve is None \
                else jnp.where(preserve, clipped, out)
            if ch_on is not None:
                out = jnp.where(ch_on.reshape((-1,) + (1,) * dim), out, d)
            return out

        data = _cond(do_c, contrast, data)

    # simulated low resolution: 2 gathers per axis
    if cfg.p_lowres > 0:
        k_do, k_z, k_ch = jax.random.split(keys[6], 3)
        do = jax.random.uniform(k_do) < cfg.p_lowres
        zoom = jax.random.uniform(k_z, (data.shape[0],),
                                  minval=cfg.lowres_zoom[0],
                                  maxval=cfg.lowres_zoom[1])
        per_ch = jax.random.uniform(k_ch, (data.shape[0],)) \
            < cfg.p_lowres_per_channel

        def lowres(d):
            def lr_channel(vol, z):
                for ax in range(dim):
                    vol = _lowres_axis(vol, z, ax, vol.shape[ax])
                return vol
            low = jax.vmap(lr_channel)(d, zoom)
            return jnp.where(per_ch.reshape((-1,) + (1,) * dim), low, d)

        data = _cond(do, lowres, data)

    # gamma (inverted then normal): pow + 6 reductions each
    k_g1, k_g2 = jax.random.split(keys[7])
    for k_g, invert, p in ((k_g1, True, cfg.p_gamma_invert),
                           (k_g2, cfg.gamma_second_invert, cfg.p_gamma)):
        if p <= 0:
            continue
        k_do, k_gam = jax.random.split(k_g)
        do = jax.random.uniform(k_do) < p
        gamma = jax.random.uniform(k_gam, (), minval=cfg.gamma_range[0],
                                   maxval=cfg.gamma_range[1])

        def apply_gamma(d, gamma=gamma, invert=invert):
            x = -d if invert else d
            mn = x.min()
            rng_ = jnp.maximum(x.max() - mn, 1e-7)
            mean, std = x.mean(), x.std()
            y = jnp.power((x - mn) / rng_, gamma) * rng_ + mn
            y = (y - y.mean()) / jnp.maximum(y.std(), 1e-7) * std + mean
            return -y if invert else y

        data = _cond(do, apply_gamma, data)

    return data


def _mirror_one_gated(key, data, seg, cfg: AugmentConfig):
    dim = data.ndim - 1
    flips = jax.random.uniform(key, (len(cfg.mirror_axes),)) < 0.5
    for i, ax in enumerate(cfg.mirror_axes):
        if ax >= dim:
            continue
        data, seg = jax.lax.cond(
            flips[i],
            lambda ds, ax=ax: (jnp.flip(ds[0], axis=ax + 1),
                               jnp.flip(ds[1], axis=ax)),
            lambda ds: ds, (data, seg))
    return data, seg


# ----------------------------------------------------------------- DA5 extras
# TPU-native re-expressions of the batchgenerators transforms that only the
# DA5 recipe uses (reference nnUNetTrainerDA5.py:110-265). batchgenerators is
# not importable in this environment, so semantics are re-derived from the
# reference call sites + the documented batchgenerators contracts; each
# deviation is noted inline. All are gated lax.cond ops in "gated" mode and
# draw their randomness from keys folded OFF the base pipeline's tree, so
# enabling them never perturbs the base draw stream.


def _rot90_one(key, data, seg, cfg: AugmentConfig, gated: bool):
    """Rot90Transform: with p_rot90, rotate k∈{0..3} quarter-turns in a
    random ordered pair of equal-size axes (reference DA5 :151-155)."""
    k_do, k_pair, k_k = jax.random.split(jax.random.fold_in(key, 90), 3)
    do = jax.random.uniform(k_do) < cfg.p_rot90
    pair_i = jax.random.randint(k_pair, (), 0, len(cfg.rot90_axes))
    quarter = jax.random.randint(k_k, (), 0, 4)

    def apply(ds):
        def for_pair(a, b):
            def rot(ds2):
                d2, s2 = ds2
                return jax.lax.switch(
                    quarter,
                    [lambda o, k=k: (jnp.rot90(o[0], k, (a + 1, b + 1)),
                                     jnp.rot90(o[1], k, (a, b)))
                     for k in range(4)],
                    (d2, s2))
            return rot
        return jax.lax.switch(pair_i,
                              [for_pair(a, b) for a, b in cfg.rot90_axes], ds)

    if gated:
        return jax.lax.cond(do, apply, lambda ds: ds, (data, seg))
    d2, s2 = apply((data, seg))
    return jnp.where(do, d2, data), jnp.where(do, s2, seg)


def _transpose_one(key, data, seg, cfg: AugmentConfig, gated: bool):
    """TransposeAxesTransform: with p_transpose, apply a uniformly random
    permutation of the equal-size axes (reference DA5 :157-159)."""
    from itertools import permutations
    dim = data.ndim - 1
    perms = []
    for p in permutations(cfg.transpose_axes):
        order = list(range(dim))
        for src, dst in zip(cfg.transpose_axes, p):
            order[src] = dst
        perms.append(tuple(order))
    k_do, k_p = jax.random.split(jax.random.fold_in(key, 91))
    do = jax.random.uniform(k_do) < cfg.p_transpose
    perm_i = jax.random.randint(k_p, (), 0, len(perms))

    def apply(ds):
        def for_perm(order):
            return lambda o: (jnp.transpose(o[0], (0,) + tuple(a + 1
                                                               for a in order)),
                              jnp.transpose(o[1], order))
        return jax.lax.switch(perm_i, [for_perm(o) for o in perms], ds)

    if gated:
        return jax.lax.cond(do, apply, lambda ds: ds, (data, seg))
    d2, s2 = apply((data, seg))
    return jnp.where(do, d2, data), jnp.where(do, s2, seg)


def _median_dense(vol, k: int):
    """EXACT dense k^dim median filter (scipy.ndimage.median_filter
    semantics, the kernel batchgenerators' MedianFilterTransform applies:
    rank n//2 of the sorted window, 'reflect' boundary = jnp.pad
    'symmetric', even sizes extend k//2 left / k-1-k//2 right). The k^3
    tap stack would need ~343x the volume in flight at k=7, so 3D volumes
    are processed as a lax.map over z-slices (one (Y, X, k^3) sort per
    slice — DA5 draws k in [2, 8), well within VMEM)."""
    dim = vol.ndim
    lo = k // 2
    hi = k - 1 - lo
    vp = jnp.pad(vol, [(lo, hi)] * dim, mode="symmetric")
    rank = (k ** dim) // 2

    def med_patches(x):
        # (1, 1, *sp) -> (1, k^dim, *out_sp): one patch-extraction op
        # (343 explicit tap slices segfault XLA CPU on larger programs)
        p = jax.lax.conv_general_dilated_patches(
            x[None, None], (k,) * dim, (1,) * dim, "VALID")
        return jnp.sort(p[0], axis=0)[rank]

    if dim == 3:
        # z-slab map bounds the k^3-tap stack to one slice's worth
        def one_z(z):
            slab = jax.lax.dynamic_slice_in_dim(vp, z, k, 0)
            return med_patches(slab)[0]

        return jax.lax.map(one_z, jnp.arange(vol.shape[0]))
    return med_patches(vp)


def _median_channel(vol, size_idx, cfg: AugmentConfig):
    lo, hi = cfg.median_size
    return jax.lax.switch(size_idx,
                          [lambda v, k=k: _median_dense(v, k)
                           for k in range(lo, hi)], vol)


def _gauss_field(key, shape):
    """Anisotropic Gaussian bump over the volume grid: per-axis sigma
    ~ exp(U(log(size//6), log(size))), center ~ U(-0.5, 1.5)*size — the
    batchgenerators local_transforms kernel (reference DA5 :235-245)."""
    field = None
    for ax, s in enumerate(shape):
        k_s = jax.random.fold_in(key, 2 * ax)
        k_l = jax.random.fold_in(key, 2 * ax + 1)
        sigma = jnp.exp(jax.random.uniform(
            k_s, (), minval=float(np.log(max(s // 6, 1))),
            maxval=float(np.log(s))))
        loc = jax.random.uniform(k_l, (), minval=-0.5, maxval=1.5) * (s - 1)
        i = jnp.arange(s, dtype=jnp.float32)
        g = -0.5 * ((i - loc) / sigma) ** 2
        field = g.reshape((-1,) + (1,) * (len(shape) - ax - 1)) if field is \
            None else field + g.reshape((-1,) + (1,) * (len(shape) - ax - 1))
    return jnp.exp(field)


def _blank_rect_channel(key, vol, cfg: AugmentConfig):
    """BlankRectangleTransform on one channel: 1..n rectangles, each set to
    the mean of its own region (rectangle_value=np.mean, reference DA5
    :224-232). Applied sequentially like the reference."""
    n_lo, n_hi = cfg.blank_rect_num
    n = jax.random.randint(jax.random.fold_in(key, 0), (), n_lo, n_hi)
    shape = vol.shape
    iotas = [jnp.arange(s).reshape((-1,) + (1,) * (len(shape) - ax - 1))
             for ax, s in enumerate(shape)]
    for r in range(n_hi - 1):
        kr = jax.random.fold_in(key, r + 1)
        mask = None
        for ax, s in enumerate(shape):
            lo = max(1, s // 10)
            hi = max(lo + 1, s // 3)
            sz = jax.random.randint(jax.random.fold_in(kr, 2 * ax), (),
                                    lo, hi)
            pos = jax.random.randint(jax.random.fold_in(kr, 2 * ax + 1), (),
                                     0, s - hi + 1)
            m = (iotas[ax] >= pos) & (iotas[ax] < pos + sz)
            mask = m if mask is None else mask & m
        active = (r < n) & mask
        rect_mean = (vol * mask).sum() / jnp.maximum(
            mask.sum().astype(vol.dtype), 1.0)
        vol = jnp.where(active, rect_mean, vol)
    return vol


def _sharpen_channel(key, vol, cfg: AugmentConfig):
    """SharpeningTransform: unsharp mask via the discrete Laplacian —
    out = x + s*(2*dim*x - sum of face neighbors), symmetric boundary
    (reference DA5 :258-264)."""
    s = jax.random.uniform(key, (), minval=cfg.sharpen_strength[0],
                           maxval=cfg.sharpen_strength[1])
    lap = 2.0 * vol.ndim * vol
    for ax in range(vol.ndim):
        pw = [(0, 0)] * vol.ndim
        pw[ax] = (1, 1)
        xp = jnp.pad(vol, pw, mode="symmetric")
        n = vol.shape[ax]
        lap = lap - jax.lax.slice_in_dim(xp, 0, n, axis=ax) \
            - jax.lax.slice_in_dim(xp, 2, n + 2, axis=ax)
    return vol + s * lap


def _post_da5_one(key, data, cfg: AugmentConfig, gated: bool):
    """The DA5 tail transforms (data only, applied after mirroring like the
    reference list): BlankRectangle, BrightnessGradientAdditive, LocalGamma,
    Sharpening — each per-sample gated, then per-channel gated."""
    dim = data.ndim - 1
    C = data.shape[0]

    def gate(tag, p_sample, p_channel, channel_fn):
        nonlocal data
        kt = jax.random.fold_in(key, tag)
        do = jax.random.uniform(jax.random.fold_in(kt, 0)) < p_sample
        per_ch = jax.random.uniform(jax.random.fold_in(kt, 1),
                                    (C,)) < p_channel
        ch_keys = jax.random.split(jax.random.fold_in(kt, 2), C)

        def apply(d):
            out = jax.vmap(channel_fn)(ch_keys, d)
            return jnp.where(per_ch.reshape((-1,) + (1,) * dim), out, d)

        data = _cond(do, apply, data) if gated \
            else jnp.where(do, apply(data), data)

    if cfg.p_blank_rect > 0:
        gate(1, cfg.p_blank_rect, cfg.p_blank_rect_per_channel,
             lambda k, v: _blank_rect_channel(k, v, cfg))

    if cfg.p_bright_grad > 0:
        # BrightnessGradientAdditiveTransform: bump normalized to peak |1|,
        # scaled by strength ~ ±U(1, 5), added (mean_centered=False)
        def bright_grad(k, v):
            field = _gauss_field(jax.random.fold_in(k, 0), v.shape)
            k_sign, k_mag = jax.random.split(jax.random.fold_in(k, 1))
            mag = jax.random.uniform(k_mag, (), minval=1.0, maxval=5.0)
            sign = jnp.where(jax.random.uniform(k_sign) < 0.5, -1.0, 1.0)
            field = field / jnp.maximum(jnp.abs(field).max(), 1e-8)
            return v + field * (sign * mag)
        gate(2, cfg.p_bright_grad, cfg.p_bright_grad_per_channel, bright_grad)

    if cfg.p_local_gamma > 0:
        # LocalGammaTransform: bump rescaled to [0,1] becomes the per-voxel
        # interpolation weight between exponent 1 (far) and gamma (peak),
        # applied on the min-max normalized channel
        def local_gamma(k, v):
            field = _gauss_field(jax.random.fold_in(k, 0), v.shape)
            k_sel, k_g = jax.random.split(jax.random.fold_in(k, 1))
            g_lo = jax.random.uniform(k_g, (), minval=0.01, maxval=0.8)
            g_hi = jax.random.uniform(jax.random.fold_in(k_g, 1), (),
                                      minval=1.5, maxval=4.0)
            gamma = jnp.where(jax.random.uniform(k_sel) < 0.5, g_lo, g_hi)
            fmin = field.min()
            field = (field - fmin) / jnp.maximum(field.max() - fmin, 1e-8)
            exponent = field * (gamma - 1.0) + 1.0
            mn, mx = v.min(), v.max()
            x = (v - mn) / jnp.maximum(mx - mn, 1e-8)
            return jnp.power(jnp.maximum(x, 1e-8), exponent) \
                * (mx - mn) + mn
        gate(3, cfg.p_local_gamma, cfg.p_local_gamma_per_channel, local_gamma)

    if cfg.p_sharpen > 0:
        gate(4, cfg.p_sharpen, cfg.p_sharpen_per_channel,
             lambda k, v: _sharpen_channel(k, v, cfg))

    return data


def _geom_da5(key, data, seg, cfg: AugmentConfig, gated: bool):
    if cfg.p_rot90 > 0 and cfg.rot90_axes:
        data, seg = _rot90_one(key, data, seg, cfg, gated)
    if cfg.p_transpose > 0 and len(cfg.transpose_axes) > 1:
        data, seg = _transpose_one(key, data, seg, cfg, gated)
    return data, seg


def _augment_one(key, data, seg, cfg: AugmentConfig):
    """data (c, *spatial), seg (*spatial)."""
    k_sp, k_int, k_mir = jax.random.split(key, 3)
    data, seg = _spatial_one(k_sp, data, seg, cfg)
    data, seg = _geom_da5(jax.random.fold_in(key, 0xDA5), data, seg, cfg,
                          gated=False)
    data = _intensity_one(k_int, data, cfg)
    data, seg = _mirror_one(k_mir, data, seg, cfg)
    data = _post_da5_one(jax.random.fold_in(key, 0xDA51), data, cfg,
                         gated=False)
    return data, seg


def _augment_one_gated(key, data, seg, cfg: AugmentConfig):
    """Identical draws/taken-branch math to _augment_one; lax.cond gating."""
    k_sp, k_int, k_mir = jax.random.split(key, 3)
    data, seg = _spatial_one_gated(k_sp, data, seg, cfg)
    data, seg = _geom_da5(jax.random.fold_in(key, 0xDA5), data, seg, cfg,
                          gated=True)
    data = _intensity_one_gated(k_int, data, cfg)
    data, seg = _mirror_one_gated(k_mir, data, seg, cfg)
    data = _post_da5_one(jax.random.fold_in(key, 0xDA51), data, cfg,
                         gated=True)
    return data, seg


def _augment_scan(keys, data, seg, cfg: AugmentConfig):
    """Gated per-sample scan over the (local) batch: one trace, runtime
    branching per sample."""
    def body(carry, xs):
        k, d, s = xs
        d2, s2 = _augment_one_gated(k, d, s, cfg)
        return carry, (d2, s2)

    _, (data, seg) = jax.lax.scan(body, None, (keys, data, seg))
    return data, seg


def _aug_mode() -> str:
    return os.environ.get("MVDSEG_AUG_MODE", "gated")


@partial(jax.jit,
         static_argnames=("cfg", "channels_first", "mode", "mesh"))
def augment_batch(key: jax.Array, data: jnp.ndarray, seg: jnp.ndarray,
                  cfg: AugmentConfig, channels_first: bool = False,
                  mode: Optional[str] = None, mesh=None):
    """channels_first: data (b, c, *in_patch) float32 → (b, c, *patch_size)
    — the TPU fast path (see module docstring). Legacy mode: data
    (b, *in_patch, c) → (b, *cfg.patch_size, c). seg (b, *in_patch) int32 →
    (b, *cfg.patch_size) either way. The random draws are identical in both
    modes (same per-sample key tree, same draw shapes).

    mode: "gated" (runtime-branching scan; default via MVDSEG_AUG_MODE) or
    "vmap" (original always-execute-and-select). mesh: pass the active
    ``jax.sharding.Mesh`` when the batch axis is sharded so the gated scan
    runs per-shard (shard_map) instead of scanning the global batch."""
    if mode is None:
        mode = _aug_mode()
    if not channels_first:
        data = jnp.moveaxis(data, -1, 1)
    keys = jax.random.split(key, data.shape[0])
    if mode == "gated":
        n_data = mesh.shape.get("data", 1) if mesh is not None else 1
        if n_data > 1 and data.shape[0] % n_data == 0:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P
            fn = shard_map(partial(_augment_scan, cfg=cfg), mesh=mesh,
                           in_specs=(P("data"), P("data"), P("data")),
                           out_specs=(P("data"), P("data")))
            data, seg = fn(keys, data, seg)
        else:
            data, seg = _augment_scan(keys, data, seg, cfg)
    else:
        data, seg = jax.vmap(lambda k, d, s: _augment_one(k, d, s, cfg))(
            keys, data, seg)
    if not channels_first:
        data = jnp.moveaxis(data, 1, -1)
    return data, seg


def downsample_seg_for_ds(seg: jnp.ndarray, ds_scales: Sequence[Sequence[float]]):
    """Nearest-neighbor downsampling of the target to each deep-supervision
    scale (reference custom_transforms/deep_supervision_donwsampling.py)."""
    outputs = []
    spatial = seg.shape[1:]
    for scale in ds_scales:
        if all(s == 1 for s in scale):
            outputs.append(seg)
            continue
        new_shape = tuple(int(round(sh * sc)) for sh, sc in zip(spatial, scale))
        out = jax.image.resize(seg.astype(jnp.float32),
                               (seg.shape[0], *new_shape), method="nearest")
        outputs.append(out.astype(seg.dtype))
    return outputs


def compute_ds_scales(pool_op_kernel_sizes) -> list:
    """Cumulative downsampling factors per deep-supervision output, finest
    first, skipping the coarsest (matches nnUNetTrainer deep_supervision_scales
    :340-345)."""
    scales = list(np.cumprod(np.vstack(pool_op_kernel_sizes), axis=0))
    return [list(1 / np.array(i)) for i in scales][:-1]
