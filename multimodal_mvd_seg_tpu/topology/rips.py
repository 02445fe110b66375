"""Differentiable Vietoris–Rips persistence layer.

Parity: reference topologylayer ``nn/rips.py`` (RipsLayer). The complex is
enumerated on host (_flag.py) through ``jax.pure_callback``; birth/death
VALUES are differentiable gathers from the pairwise-distance matrix, so
gradients reach the points through d‖xᵢ−xⱼ‖/dx.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ._flag import flag_persistence_host


def _pairwise_dist(x: jnp.ndarray) -> jnp.ndarray:
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, -1)
    return jnp.sqrt(jnp.maximum(d2, 1e-12))


def _gather_dgms(dist, dims, bi, bj, di, dj, maxdim):
    birth = jnp.where(bi == bj, 0.0, dist[jnp.clip(bi, 0), jnp.clip(bj, 0)])
    finite = di >= 0
    death = jnp.where(finite, dist[jnp.clip(di, 0), jnp.clip(dj, 0)],
                      jnp.max(dist))
    dgms = []
    for d in range(maxdim + 1):
        m = dims == d
        dgms.append({"birth": jnp.where(m, birth, 0.0),
                     "death": jnp.where(m, death, 0.0),
                     "mask": m, "finite": m & finite})
    return tuple(dgms)


class RipsLayer:
    """points (N, D) → (dgms per dim, issublevel=True)."""

    def __init__(self, maxdim: int = 1, cap: int = 1024):
        self.maxdim = maxdim
        self.cap = cap

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, x: jnp.ndarray):
        n = x.shape[0]
        dist = _pairwise_dist(x.astype(jnp.float32))
        maxdim, cap = self.maxdim, self.cap

        def cb(dmat):
            top = [tuple(range(n))] if n <= maxdim + 2 else \
                list(__import__("itertools").combinations(range(n),
                                                          maxdim + 2))
            return flag_persistence_host(np.asarray(dmat, np.float64), top,
                                         maxdim, cap)

        shapes = tuple(jax.ShapeDtypeStruct((cap,), jnp.int32)
                       for _ in range(5))
        dims, bi, bj, di, dj = jax.pure_callback(
            cb, shapes, jax.lax.stop_gradient(dist),
            vmap_method="sequential")
        return _gather_dgms(dist, dims, bi, bj, di, dj, self.maxdim), True
