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
    do_scale = jax.random.uniform(k_scl) < cfg.p_scale
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


def _gaussian_blur_one(key, data, cfg: AugmentConfig):
    dim = data.ndim - 1
    k_do, k_sig, k_ch = jax.random.split(key, 3)
    do = jax.random.uniform(k_do) < cfg.p_blur
    sigma = jax.random.uniform(k_sig, (data.shape[0],),
                               minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1])
    per_ch = jax.random.uniform(k_ch, (data.shape[0],)) < cfg.p_blur_per_channel
    radius = 3  # covers sigma ≤ 1.0 (4σ truncation would be 4; 3 is <1e-3 tail)

    def blur_channel(vol, s):
        kern = _gauss_kernel(s, radius)
        for ax in range(dim):
            vol = _blur_axis(vol, kern, ax)
        return vol

    blurred = jax.vmap(blur_channel)(data, sigma)
    use = do & per_ch
    return jnp.where(use.reshape((-1,) + (1,) * dim), blurred, data)


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
    # blur
    data = _gaussian_blur_one(keys[3], data, cfg)
    # brightness (multiplicative)
    do_b = jax.random.uniform(keys[4]) < cfg.p_brightness
    bfac = jax.random.uniform(keys[8], (), minval=cfg.brightness_range[0],
                              maxval=cfg.brightness_range[1])
    data = jnp.where(do_b, data * bfac, data)
    # contrast (preserve range)
    do_c = jax.random.uniform(keys[5]) < cfg.p_contrast
    cfac = jax.random.uniform(keys[9], (), minval=cfg.contrast_range[0],
                              maxval=cfg.contrast_range[1])
    axes = tuple(range(1, data.ndim))  # per-channel stats over spatial
    mean = data.mean(axis=axes, keepdims=True)
    mn = data.min(axis=axes, keepdims=True)
    mx = data.max(axis=axes, keepdims=True)
    contrasted = jnp.clip((data - mean) * cfac + mean, mn, mx)
    data = jnp.where(do_c, contrasted, data)
    # simulate low res
    data = _lowres_one(keys[6], data, cfg)
    # gamma (inverted then normal, reference order :742-752)
    k_g1, k_g2 = jax.random.split(keys[7])
    data = _gamma_one(k_g1, data, cfg, invert=True, p=cfg.p_gamma_invert)
    data = _gamma_one(k_g2, data, cfg, invert=False, p=cfg.p_gamma)
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

    # blur: 3 separable convs per channel
    if cfg.p_blur > 0:
        k_do, k_sig, k_ch = jax.random.split(keys[3], 3)
        do = jax.random.uniform(k_do) < cfg.p_blur
        sigma = jax.random.uniform(k_sig, (data.shape[0],),
                                   minval=cfg.blur_sigma[0],
                                   maxval=cfg.blur_sigma[1])
        per_ch = jax.random.uniform(k_ch, (data.shape[0],)) \
            < cfg.p_blur_per_channel

        def blur(d):
            def blur_channel(vol, s):
                kern = _gauss_kernel(s, 3)
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

    # contrast: 3 reductions + clip
    if cfg.p_contrast > 0:
        do_c = jax.random.uniform(keys[5]) < cfg.p_contrast
        cfac = jax.random.uniform(keys[9], (), minval=cfg.contrast_range[0],
                                  maxval=cfg.contrast_range[1])

        def contrast(d):
            axes = tuple(range(1, d.ndim))
            mean = d.mean(axis=axes, keepdims=True)
            mn = d.min(axis=axes, keepdims=True)
            mx = d.max(axis=axes, keepdims=True)
            return jnp.clip((d - mean) * cfac + mean, mn, mx)

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
                           (k_g2, False, cfg.p_gamma)):
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


def _augment_one(key, data, seg, cfg: AugmentConfig):
    """data (c, *spatial), seg (*spatial)."""
    k_sp, k_int, k_mir = jax.random.split(key, 3)
    data, seg = _spatial_one(k_sp, data, seg, cfg)
    data = _intensity_one(k_int, data, cfg)
    data, seg = _mirror_one(k_mir, data, seg, cfg)
    return data, seg


def _augment_one_gated(key, data, seg, cfg: AugmentConfig):
    """Identical draws/taken-branch math to _augment_one; lax.cond gating."""
    k_sp, k_int, k_mir = jax.random.split(key, 3)
    data, seg = _spatial_one_gated(k_sp, data, seg, cfg)
    data = _intensity_one_gated(k_int, data, cfg)
    data, seg = _mirror_one_gated(k_mir, data, seg, cfg)
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
