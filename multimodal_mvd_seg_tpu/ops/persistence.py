"""Differentiable persistent homology for JAX (host C++ core + gather VJP).

Replaces the reference's torch-extension persistence stack
(topologylayer/functional/persistence/*, functional/sublevel.py:8-46) and the
gudhi/torch_topological CubicalComplex uses (MVDTrainer.py:94-97,904-924):
the combinatorial reduction runs on host C++ (ops/native/persistence.cpp)
via ``jax.pure_callback``; the callback returns only *integer critical-vertex
indices* (plus dims/mask), and birth/death VALUES are re-read from the input
with a differentiable ``take`` — so gradients reach exactly the critical
voxels, the same routing as the reference's ``persistenceBackward``.

Fixed output caps keep shapes static for XLA (SURVEY.md §7 "hard parts");
overflowing bars are dropped lowest-persistence-last by the C++ emit order
and flagged through the validity mask.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _host_cubical(img: np.ndarray, maxdim: int, cap: int, keep_zero: bool,
                  only_dim: int = None
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host side: returns (dims (cap,), birth_idx (cap,), death_idx (cap,)).
    death_idx == -1 ⇒ essential bar; dims == -1 ⇒ padding.

    The C++ core emits bars in birth-filtration order and truncates at its
    cap — on realistic maps the thousands of early dim-0/1 bars would crowd
    every dim-2 bar out of a small cap. ``only_dim`` therefore runs the
    reduction with a generous internal cap, keeps only that dimension's
    bars, and truncates to the ``cap`` HIGHEST-PERSISTENCE bars (the ones
    that matter for any distance/feature downstream)."""
    from .native.build import load_library
    import ctypes
    lib = load_library()
    img = np.ascontiguousarray(img, np.float32)
    shape = img.shape
    while len(shape) < 3:
        shape = shape + (1,)
    internal_cap = cap if only_dim is None else max(cap, 1 << 18)
    out_dim = np.full(internal_cap, -1, np.int32)
    out_b = np.zeros(internal_cap, np.int64)
    out_d = np.full(internal_cap, -1, np.int64)
    n = lib.cubical_persistence(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        shape[0], shape[1], shape[2], maxdim, int(keep_zero), internal_cap,
        out_dim.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_b.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
    out_dim[n:] = -1
    if only_dim is not None:
        keep = out_dim == only_dim
        dims, b, d = out_dim[keep], out_b[keep], out_d[keep]
        flat = img.reshape(-1)
        death = np.where(d >= 0, flat[np.clip(d, 0, None)], flat.max())
        pers = np.abs(death - flat[np.clip(b, 0, None)])
        order = np.argsort(-pers, kind="stable")[:cap]
        dims, b, d = dims[order], b[order], d[order]
        out_dim = np.full(cap, -1, np.int32)
        out_b = np.zeros(cap, np.int64)
        out_d = np.full(cap, -1, np.int64)
        out_dim[:len(dims)] = dims
        out_b[:len(dims)] = b
        out_d[:len(dims)] = d
    else:
        out_dim, out_b, out_d = out_dim[:cap], out_b[:cap], out_d[:cap]
    # int32 for the JAX callback (x64 is disabled); volumes stay < 2^31 voxels
    return out_dim, out_b.astype(np.int32), out_d.astype(np.int32)


@functools.partial(jax.jit, static_argnames=("maxdim", "cap", "keep_zero",
                                             "superlevel", "only_dim"))
def cubical_persistence_pairs(image: jnp.ndarray, maxdim: int = None,
                              cap: int = 2048, keep_zero: bool = False,
                              superlevel: bool = False,
                              only_dim: int = None):
    """Sublevel (or superlevel) cubical persistence of a 1D/2D/3D image.

    Returns a dict of fixed-shape arrays:
      dims   (cap,) int32   bar dimension, -1 = padding
      birth  (cap,) f32     birth value (differentiable w.r.t. image)
      death  (cap,) f32     death value; essential bars get the image max
                            (sublevel) so death-birth = total range
      finite (cap,) bool    True for finite (non-essential) bars
      valid  (cap,) bool    True for real (non-padding) bars

    only_dim: restrict the output to one homology dimension, capped to the
    highest-persistence bars (see _host_cubical) — without it, a small cap
    is consumed by early-filtration dim-0/1 bars on realistic maps.
    """
    if maxdim is None:
        maxdim = max(image.ndim - 1, 0)
    x = -image if superlevel else image
    x32 = x.astype(jnp.float32)

    def cb(a):
        return _host_cubical(np.asarray(a), maxdim, cap, keep_zero,
                             only_dim)

    dims, b_idx, d_idx = jax.pure_callback(
        cb,
        (jax.ShapeDtypeStruct((cap,), jnp.int32),
         jax.ShapeDtypeStruct((cap,), jnp.int32),
         jax.ShapeDtypeStruct((cap,), jnp.int32)),
        jax.lax.stop_gradient(x32), vmap_method="sequential")

    flat = x32.reshape(-1)
    valid = dims >= 0
    finite = valid & (d_idx >= 0)
    birth = jnp.take(flat, jnp.clip(b_idx, 0), fill_value=0.0)
    death_gather = jnp.take(flat, jnp.clip(d_idx, 0), fill_value=0.0)
    death = jnp.where(finite, death_gather, jnp.max(flat))
    if superlevel:
        birth, death = -birth, -death
    birth = jnp.where(valid, birth, 0.0)
    death = jnp.where(valid, death, 0.0)
    return {"dims": dims, "birth": birth, "death": death,
            "finite": finite, "valid": valid}


def betti_numbers(image: np.ndarray, threshold: float = 0.5,
                  maxdim: int = None) -> np.ndarray:
    """Betti numbers of the binarized sublevel set {image >= threshold}
    (host utility — reference training/metrics/betti_compute.py:8-53).
    Superlevel thresholding is expressed as sublevel persistence of the
    negated mask; bars alive at filtration value -1 are counted."""
    img = np.asarray(image, np.float32)
    if maxdim is None:
        maxdim = max(img.ndim - 1, 0)
    mask = (img >= threshold).astype(np.float32)
    dims, b_idx, d_idx = _host_cubical(-mask, maxdim, cap=1 << 20,
                                       keep_zero=False)
    flat = (-mask).reshape(-1)
    betti = np.zeros(maxdim + 1, np.int64)
    for dim, bi, di in zip(dims, b_idx, d_idx):
        if dim < 0 or dim > maxdim:
            continue
        birth = flat[bi]
        death = flat[di] if di >= 0 else np.inf
        if birth <= -1.0 < death:
            betti[dim] += 1
    return betti


def simplicial_persistence_pairs(dims: np.ndarray, bnd_offsets: np.ndarray,
                                 bnd_indices: np.ndarray, cap: int):
    """Host-side generic reduction: cells in filtration order, CSR boundary.
    Returns (bar_dims, birth_cell, death_cell) (death -1 = essential),
    padded to cap with bar_dims == -1."""
    from .native.build import load_library
    import ctypes
    lib = load_library()
    dims = np.ascontiguousarray(dims, np.int32)
    bnd_offsets = np.ascontiguousarray(bnd_offsets, np.int64)
    bnd_indices = np.ascontiguousarray(bnd_indices, np.int64)
    out_dim = np.full(cap, -1, np.int32)
    out_b = np.zeros(cap, np.int64)
    out_d = np.full(cap, -1, np.int64)
    n = lib.simplicial_persistence(
        len(dims),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        bnd_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        bnd_indices.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        0, cap,
        out_dim.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_b.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
    out_dim[n:] = -1
    return out_dim, out_b, out_d
