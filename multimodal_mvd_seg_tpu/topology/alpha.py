"""Differentiable alpha-complex (weak Alpha / Delaunay-flag) layer.

Parity: reference topologylayer ``nn/alpha.py`` (AlphaLayer), which builds
the Delaunay triangulation and filters it by longest edge (a "weak alpha
complex"). Delaunay runs on host (scipy.spatial); values/gradients flow
through the pairwise-distance gathers exactly as in RipsLayer.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ._flag import flag_persistence_host
from .rips import _gather_dgms, _pairwise_dist


class AlphaLayer:
    """points (N, D) → (dgms per dim, issublevel=True)."""

    def __init__(self, maxdim: int = 1, cap: int = 1024):
        self.maxdim = maxdim
        self.cap = cap

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, x: jnp.ndarray):
        dist = _pairwise_dist(x.astype(jnp.float32))
        maxdim, cap = self.maxdim, self.cap

        def cb(pts, dmat):
            from scipy.spatial import Delaunay
            pts = np.asarray(pts, np.float64)
            if len(pts) <= pts.shape[1] + 1:
                top = [tuple(range(len(pts)))]
            else:
                top = [tuple(s) for s in Delaunay(pts).simplices]
            return flag_persistence_host(np.asarray(dmat, np.float64), top,
                                         maxdim, cap)

        shapes = tuple(jax.ShapeDtypeStruct((cap,), jnp.int32)
                       for _ in range(5))
        dims, bi, bj, di, dj = jax.pure_callback(
            cb, shapes, jax.lax.stop_gradient(x.astype(jnp.float32)),
            jax.lax.stop_gradient(dist), vmap_method="sequential")
        return _gather_dgms(dist, dims, bi, bj, di, dj, self.maxdim), True
