"""Barcode featurization layers on masked fixed-cap diagrams.

Parity: reference topologylayer ``nn/features.py`` —
SumBarcodeLengths, TopKBarcodeLengths, PartialSumBarcodeLengths,
BarcodePolyFeature. Inputs are the ``(dgms, issublevel)`` pairs produced by
the levelset/rips/alpha layers; all ops are pure and differentiable.
"""

import jax
import jax.numpy as jnp


def _lengths(dgm, finite_only: bool = True):
    mask = dgm["mask"]
    if finite_only and "finite" in dgm:
        mask = mask & dgm["finite"]
    lens = jnp.abs(dgm["death"] - dgm["birth"])
    return jnp.where(mask, lens, 0.0)


class SumBarcodeLengths:
    """Σ (death − birth) over the finite bars of one dimension."""

    def __init__(self, dim: int = 0, power: float = 1.0):
        self.dim = dim
        self.power = power

    def __call__(self, dgminfo):
        dgms, _ = dgminfo
        lens = _lengths(dgms[self.dim])
        return (lens ** self.power).sum()


class TopKBarcodeLengths:
    """The k longest bar lengths of one dimension, descending, zero-padded."""

    def __init__(self, dim: int, k: int):
        self.dim = dim
        self.k = k

    def __call__(self, dgminfo):
        dgms, _ = dgminfo
        lens = _lengths(dgms[self.dim])
        top, _ = jax.lax.top_k(lens, self.k)
        return top


class PartialSumBarcodeLengths:
    """Σ of bar lengths skipping the ``skip`` longest (suppresses everything
    but the desired Betti number of features)."""

    def __init__(self, dim: int, skip: int, power: float = 1.0):
        self.dim = dim
        self.skip = skip
        self.power = power

    def __call__(self, dgminfo):
        dgms, _ = dgminfo
        lens = _lengths(dgms[self.dim])
        sorted_desc = -jnp.sort(-lens)
        return (sorted_desc[self.skip:] ** self.power).sum()


class BarcodePolyFeature:
    """Σ |death − birth|^p · ((death + birth)/2)^q over finite bars."""

    def __init__(self, dim: int, p: float, q: float):
        self.dim = dim
        self.p = p
        self.q = q

    def __call__(self, dgminfo):
        dgms, _ = dgminfo
        dgm = dgms[self.dim]
        mask = dgm["mask"]
        if "finite" in dgm:
            mask = mask & dgm["finite"]
        lens = jnp.abs(dgm["death"] - dgm["birth"])
        mids = (dgm["death"] + dgm["birth"]) / 2.0
        feat = (lens ** self.p) * (mids ** self.q)
        return jnp.where(mask, feat, 0.0).sum()
