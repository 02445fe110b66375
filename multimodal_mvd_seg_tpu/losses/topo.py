"""Topological losses (three variants, matching the reference inventory).

1. ``Topological_loss`` — reference training/loss/TopoLoss.py:8-47 and the
   in-trainer use at MVDTrainer.py:904-924: cubical persistence of the
   predicted probability map and the ground-truth mask, q-Wasserstein
   between the diagrams of a chosen homology dimension, λ-weighted mean
   over the batch.
2. ``TopoBarcodeLoss`` — reference training/loss/Topo_Loss.py:16-85
   ("TopoLoss"): top-k squared bar lengths with a Betti-number prior (the
   first β bars of each dimension are *encouraged* — negative sign — the
   rest suppressed) + an MSE reproduction term (weights topo=1, sqdiff=10,
   k=20).
3. ``topo_critical_point_loss`` — reference training/loss/TopoLossNIPS.py
   (:8-224, gudhi-based): match the prediction's diagram to the target's;
   MSE that pushes matched critical pixels toward the target values and
   unmatched (noise) bars toward the diagonal — expressed here directly as
   the squared-Wasserstein objective restricted to critical pixels, which
   is the same gradient signal the NIPS'19 implementation assembles by
   hand through its force/weight maps.

All run persistence on the host C++ core (ops/persistence.py) and assemble
gradients on device; batch elements go through ``jax.vmap`` (the callbacks
serialize per element, like the reference's python loop over batch_iter).
"""

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.persistence import cubical_persistence_pairs
from ..ops.wasserstein import wasserstein_distance


def _maybe_pool(x: jnp.ndarray, factor: Optional[Sequence[int]]):
    """Average-pool a (d1..dk) map by an integer factor per axis — the
    documented speed knob for per-step training use (the reference pays the
    full gudhi cost on CPU; SURVEY.md §7 'hard parts')."""
    if factor is None or all(f == 1 for f in factor):
        return x
    window = tuple(int(f) for f in factor)
    denom = 1
    for f in window:
        denom *= f
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window, window, "VALID") / float(denom)


def topo_wasserstein(pred: jnp.ndarray, target: jnp.ndarray,
                     topo_dim: Optional[int] = 2, q: float = 2.0,
                     cap: int = 512,
                     downsample: Optional[Sequence[int]] = None
                     ) -> jnp.ndarray:
    """Per-sample cubical-Wasserstein topo loss, mean over batch.

    pred/target: (B, *spatial) probability maps / one-hot masks.
    topo_dim selects the homology dimension compared (the MVD trainer uses
    d=2, MVDTrainer.py:93 topo_feat_d); None compares all dims jointly.
    """
    maxdim = pred.ndim - 2

    def one(p, t):
        p = _maybe_pool(p, downsample)
        t = _maybe_pool(t, downsample)
        dp = cubical_persistence_pairs(p, maxdim=maxdim, cap=cap)
        dt = cubical_persistence_pairs(t, maxdim=maxdim, cap=cap)

        def sel(d):
            m = d["finite"]
            if topo_dim is not None:
                m = m & (d["dims"] == topo_dim)
            return d["birth"], d["death"], m

        b1, de1, m1 = sel(dp)
        b2, de2, m2 = sel(dt)
        return wasserstein_distance(b1, de1, m1, b2, de2, m2, q=q)

    return jax.vmap(one)(pred, target).mean()


class Topological_loss:
    """Reference TopoLoss.py:8-47: λ · mean over batch of the q-Wasserstein
    distance between prediction and target cubical diagrams."""

    def __init__(self, q: float = 2.0, lam: float = 0.1,
                 topo_dim: Optional[int] = None, cap: int = 512,
                 downsample: Optional[Sequence[int]] = None):
        self.q = q
        self.lam = lam
        self.topo_dim = topo_dim
        self.cap = cap
        self.downsample = downsample

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return self.lam * topo_wasserstein(pred, target, self.topo_dim,
                                           self.q, self.cap, self.downsample)


def topk_barcode_lengths(image: jnp.ndarray, dim: int, k: int,
                         cap: int = 512, superlevel: bool = True):
    """Lengths of the k longest dim-d bars of the (super)level-set diagram,
    descending, zero-padded — reference topologylayer
    nn/features.py TopKBarcodeLengths semantics."""
    out = cubical_persistence_pairs(image, maxdim=max(dim, image.ndim - 1),
                                    cap=cap, superlevel=superlevel)
    keep = out["valid"] & (out["dims"] == dim) & out["finite"]
    lengths = jnp.where(keep, jnp.abs(out["death"] - out["birth"]), 0.0)
    top, _ = jax.lax.top_k(lengths, k)
    return top


class TopoBarcodeLoss:
    """Reference Topo_Loss.py:16-85: for each spatial map, superlevel
    persistence; the top-k dim-``d`` bar lengths are squared and the first
    ``beta`` get sign −1 (maximize: true structures), the rest +1
    (minimize: topological noise); plus ``w_sqdiff``·MSE(pred, target).
    betas: {dim: expected Betti number}."""

    def __init__(self, betas: Dict[int, int] = None, k: int = 20,
                 w_topo: float = 1.0, w_sqdiff: float = 10.0,
                 cap: int = 512):
        self.betas = betas if betas is not None else {0: 1}
        self.k = k
        self.w_topo = w_topo
        self.w_sqdiff = w_sqdiff
        self.cap = cap

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        def one(p):
            loss = 0.0
            for dim, beta in self.betas.items():
                lengths = topk_barcode_lengths(p, dim, self.k, self.cap)
                signs = jnp.where(jnp.arange(self.k) < beta, -1.0, 1.0)
                loss = loss + (signs * lengths ** 2).sum()
            return loss

        topo = jax.vmap(one)(pred).mean()
        sq = jnp.mean((pred.astype(jnp.float32) -
                       target.astype(jnp.float32)) ** 2)
        return self.w_topo * topo + self.w_sqdiff * sq


def topo_critical_point_loss(likelihood: jnp.ndarray, target: jnp.ndarray,
                             topo_dim: Optional[int] = None,
                             cap: int = 512,
                             patch: Optional[int] = None) -> jnp.ndarray:
    """NIPS'19-style topology loss (reference TopoLossNIPS.getTopoLoss
    :133-224): squared-distance objective on the matched critical points of
    the likelihood map vs the ground-truth diagram. ``patch`` optionally
    tiles the (single) 2D map into patch×patch windows like the reference's
    100×100 loop."""
    like = likelihood.astype(jnp.float32)
    tgt = target.astype(jnp.float32)
    if patch is not None and like.ndim == 2:
        h = (like.shape[0] // patch) * patch
        w = (like.shape[1] // patch) * patch
        like = like[:h, :w].reshape(h // patch, patch, w // patch, patch)
        like = like.transpose(0, 2, 1, 3).reshape(-1, patch, patch)
        tgt = tgt[:h, :w].reshape(h // patch, patch, w // patch, patch)
        tgt = tgt.transpose(0, 2, 1, 3).reshape(-1, patch, patch)
    else:
        like = like[None]
        tgt = tgt[None]

    def one(p, t):
        return topo_wasserstein(p[None], t[None], topo_dim=topo_dim, q=2.0,
                                cap=cap) ** 2

    return jax.vmap(one)(like, tgt).mean()
