"""Differentiable Wasserstein distance between persistence diagrams.

Equivalent of torch_topological's ``WassersteinDistance`` as used by the MVD
trainer (reference MVDTrainer.py:99?,919-923 — q=2 Wasserstein between the
vessel-channel cubical diagrams of prediction and ground truth).

Split the same way as the persistence bridge: the OPTIMAL MATCHING is
combinatorial and runs on host (scipy linear_sum_assignment over the
standard augmented cost matrix where unmatched points pair with their
diagonal projection), returned as integer index arrays through
``jax.pure_callback``; the LOSS is then assembled in JAX from the
differentiable birth/death values, so gradients flow to the critical voxels
of both diagrams. Fixed caps + masks keep shapes static.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _host_match(d1: np.ndarray, m1: np.ndarray, d2: np.ndarray,
                m2: np.ndarray, q: float):
    """Optimal partial matching between two diagrams.

    d1 (n1,2), d2 (n2,2) float32 (birth, death); m1/m2 validity masks.
    Returns match1 (n1,) int32: index into d2 or -1 (diagonal) or -2 (pad);
            match2 (n2,) int32: -1 where d2[j] goes to the diagonal, else the
            matching d1 row, -2 pad.
    """
    from scipy.optimize import linear_sum_assignment
    i1 = np.flatnonzero(m1)
    i2 = np.flatnonzero(m2)
    n1, n2 = len(i1), len(i2)
    match1 = np.full(d1.shape[0], -2, np.int32)
    match2 = np.full(d2.shape[0], -2, np.int32)
    match1[i1] = -1
    match2[i2] = -1
    if n1 and n2:
        p1 = d1[i1].astype(np.float64)
        p2 = d2[i2].astype(np.float64)
        # L∞ ground metric, standard for diagram distances
        C = np.abs(p1[:, None, :] - p2[None, :, :]).max(-1) ** q
        diag1 = (np.abs(p1[:, 1] - p1[:, 0]) / 2.0) ** q
        diag2 = (np.abs(p2[:, 1] - p2[:, 0]) / 2.0) ** q
        # EXACT pruning: if cost(i,j) >= diag_i + diag_j for every j, the
        # exchange argument gives an optimal matching with i on the
        # diagonal (replacing a pairing (i,j) by two diagonal hits never
        # increases the total). Typical diagrams are mostly tiny noise
        # bars, so the LAP collapses to the few structurally useful points.
        useful = C < diag1[:, None] + diag2[None, :]
        k1 = np.flatnonzero(useful.any(1))
        k2 = np.flatnonzero(useful.any(0))
        m1_, m2_ = len(k1), len(k2)
        if m1_ and m2_:
            big = np.zeros((m1_ + m2_, m2_ + m1_))
            big[:m1_, :m2_] = C[np.ix_(k1, k2)]
            # diagonal slots are indistinguishable, so every slot may carry
            # any point at that point's own diagonal cost — same optimum as
            # the textbook one-slot-per-point + INF construction, and much
            # faster for scipy's LAP (huge sentinels poison its pricing)
            big[:m1_, m2_:] = diag1[k1][:, None]
            big[m1_:, :m2_] = diag2[k2][None, :]
            rows, cols = linear_sum_assignment(big)
            for r, c in zip(rows, cols):
                if r < m1_ and c < m2_:
                    match1[i1[k1[r]]] = i2[k2[c]]
                    match2[i2[k2[c]]] = i1[k1[r]]
    return match1, match2


def _host_match_per_dim(d1: np.ndarray, m1: np.ndarray, dims1: np.ndarray,
                        d2: np.ndarray, m2: np.ndarray, dims2: np.ndarray,
                        q: float):
    """Per-homology-dimension optimal matching: cross-dimension pairings
    are forbidden (an H0 component bar can never match an H2 void bar —
    they are different features; torch_topological's WassersteinDistance
    likewise zips diagrams dimension by dimension). Each dimension's bars
    are matched independently with ``_host_match``; the merged match
    arrays cover the disjoint union, so downstream cost assembly is
    unchanged."""
    match1 = np.full(d1.shape[0], -2, np.int32)
    match2 = np.full(d2.shape[0], -2, np.int32)
    for d in np.union1d(dims1[m1], dims2[m2]):
        s1 = m1 & (dims1 == d)
        s2 = m2 & (dims2 == d)
        r1, r2 = _host_match(d1, s1, d2, s2, q)
        match1 = np.where(s1, r1, match1)
        match2 = np.where(s2, r2, match2)
    return match1, match2


@functools.partial(jax.jit, static_argnames=("q",))
def wasserstein_distance(birth1, death1, mask1, birth2, death2, mask2,
                         q: float = 2.0, dims1=None, dims2=None):
    """q-Wasserstein distance (L∞ ground metric) between two padded
    diagrams; differentiable w.r.t. all birth/death inputs.

    When ``dims1``/``dims2`` (per-bar homology dimensions) are given, the
    optimal matching is computed per dimension (``_host_match_per_dim``)
    and the costs aggregate jointly — the q-Wasserstein distance on the
    disjoint union of the per-dimension diagrams."""
    d1 = jnp.stack([birth1, death1], -1).astype(jnp.float32)
    d2 = jnp.stack([birth2, death2], -1).astype(jnp.float32)

    n1 = d1.shape[0]
    n2 = d2.shape[0]
    out_spec = (jax.ShapeDtypeStruct((n1,), jnp.int32),
                jax.ShapeDtypeStruct((n2,), jnp.int32))
    if dims1 is None:
        def cb(a1, k1, a2, k2):
            return _host_match(np.asarray(a1), np.asarray(k1),
                               np.asarray(a2), np.asarray(k2), q)

        match1, match2 = jax.pure_callback(
            cb, out_spec,
            jax.lax.stop_gradient(d1), mask1,
            jax.lax.stop_gradient(d2), mask2, vmap_method="sequential")
    else:
        def cb_dims(a1, k1, g1, a2, k2, g2):
            return _host_match_per_dim(
                np.asarray(a1), np.asarray(k1), np.asarray(g1),
                np.asarray(a2), np.asarray(k2), np.asarray(g2), q)

        match1, match2 = jax.pure_callback(
            cb_dims, out_spec,
            jax.lax.stop_gradient(d1), mask1, dims1,
            jax.lax.stop_gradient(d2), mask2, dims2,
            vmap_method="sequential")

    # matched pairs: cost from row side only (avoids double counting)
    partner = jnp.take(d2, jnp.clip(match1, 0), axis=0)
    pair_cost = jnp.max(jnp.abs(d1 - partner), -1) ** q
    diag1_cost = (jnp.abs(d1[:, 1] - d1[:, 0]) / 2.0) ** q
    cost1 = jnp.where(match1 >= 0, pair_cost,
                      jnp.where(match1 == -1, diag1_cost, 0.0))
    diag2_cost = (jnp.abs(d2[:, 1] - d2[:, 0]) / 2.0) ** q
    cost2 = jnp.where(match2 == -1, diag2_cost, 0.0)
    total = cost1.sum() + cost2.sum()
    # total**(1/q) has an infinite derivative at 0 (d√x/dx = 1/(2√x)); an
    # empty pair of diagrams (no valid bars, no unmatched target bars —
    # e.g. a vessel-free batch against a constant pooled prediction) would
    # inject NaN into every gradient. Clamp the base; zero the value (and
    # thereby the branch's gradient) when the true total is zero.
    safe = jnp.maximum(total, 1e-12) ** (1.0 / q)
    return jnp.where(total > 0, safe, 0.0)
