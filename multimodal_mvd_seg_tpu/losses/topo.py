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
   (:8-224, gudhi-based): per-patch dim-0 persistence of 1−likelihood,
   rank-matching of prediction bars against the ground truth's
   (compute_dgm_force), host-built critical-pixel weight/reference maps,
   and a device-side MSE over those pixels (faithful getTopoLoss port).

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


def _maybe_pool(x: jnp.ndarray, factor: Optional[Sequence[int]],
                mode: str = "avg"):
    """Pool a (d1..dk) map by an integer factor per axis — the documented
    speed knob for per-step training use (the reference pays the full
    gudhi cost on CPU at full resolution; SURVEY.md §7 'hard parts').

    ``mode``: "avg" or "max". Average pooling dilutes a 1-voxel
    false-positive component to 1/prod(factor) of its amplitude — a
    near-zero persistence bar the Wasserstein matching prunes as noise —
    so the topological term is blind to exactly the specks the Betti
    error counts. Max pooling keeps such a component at full amplitude
    (and is the topology-preserving downsampling for bright thin
    structures on a dark background), and its gradient routes to the
    speck's own argmax voxel.

    Implementation note: window always equals stride here, so max pooling
    is a reshape (d1,f1,d2,f2,...) + ``jnp.max`` over the factor axes.
    This matters on TPU: the VJP of ``reduce_window``-max lowers to
    SelectAndScatter, which XLA:TPU rejects for 3 pooled spatial axes
    ("Select and Scatter with less than 2 inactive dims is not
    implemented") — the round-4 chip crash. ``jnp.max``'s VJP is an
    equality-mask broadcast, which lowers fine. Numerics are identical
    to windowed max; the gradient differs from SelectAndScatter only on
    exact ties (spread across tied voxels instead of picking one)."""
    if mode not in ("avg", "max"):
        raise ValueError(
            f"_maybe_pool: mode must be 'avg' or 'max', got {mode!r}")
    if factor is None or all(f == 1 for f in factor):
        return x
    window = tuple(int(f) for f in factor)
    if len(window) != x.ndim:
        raise ValueError(
            f"_maybe_pool: factor {window} must give one entry per axis of "
            f"the {x.ndim}-d map")
    # crop to a multiple of the window (= reduce_window "VALID")
    crop = tuple(slice(0, (s // f) * f) for s, f in zip(x.shape, window))
    xc = x[crop]
    split_shape, factor_axes = [], []
    for i, (s, f) in enumerate(zip(xc.shape, window)):
        split_shape.extend([s // f, f])
        factor_axes.append(2 * i + 1)
    xr = xc.reshape(split_shape)
    if mode == "max":
        return jnp.max(xr, axis=tuple(factor_axes))
    return jnp.mean(xr, axis=tuple(factor_axes))


def topo_match_host(pred: "np.ndarray", target: "np.ndarray",
                    topo_dim: Optional[int], q: float, cap: int):
    """Host half of the two-phase topological loss.

    Runs cubical persistence (C++ core) on the *pooled* prediction and
    ground-truth maps and the optimal q-Wasserstein matching between the
    finite ``topo_dim`` bars of each sample — exactly the combinatorial,
    gradient-detached work that ``topo_wasserstein`` does through
    ``jax.pure_callback``. Split out so backends that reject host callbacks
    (e.g. the axon-tunneled TPU) can run it *between* two device programs:
    device jit #1 produces the pooled vessel probabilities, this function
    produces the match data, and ``topo_loss_from_match`` (inside the train
    jit) re-reads the birth/death values differentiably. Matches the
    reference's structure, where the matching is a detached constant of the
    gradient (MVDTrainer.py:904-924 via torch_topological).

    pred/target: (B, *spatial) float arrays (already pooled).
    Returns a dict of numpy arrays, shapes fixed by ``cap``:
      b_idx   (B, cap) int32  birth critical-vertex flat index (-1 pad)
      d_idx   (B, cap) int32  death critical-vertex flat index
      partner (B, cap, 2) f32 matched target (birth, death); unused for
                              diagonal-matched bars
      diag    (B, cap) bool   pred bar matched to its diagonal projection
      valid   (B, cap) bool   real pred bar (contributes cost)
      const   (B,)     f32    target-side unmatched diagonal cost (constant)
    """
    import numpy as np
    from ..ops.persistence import _host_cubical
    from ..ops.wasserstein import _host_match

    B = pred.shape[0]
    maxdim = pred.ndim - 2
    b_idx = np.full((B, cap), -1, np.int32)
    d_idx = np.full((B, cap), -1, np.int32)
    partner = np.zeros((B, cap, 2), np.float32)
    diag = np.zeros((B, cap), bool)
    valid = np.zeros((B, cap), bool)
    const = np.zeros((B,), np.float32)

    def finite_bars(img):
        dims, bi, di = _host_cubical(np.asarray(img, np.float32), maxdim,
                                     cap, False, only_dim=topo_dim)
        keep = (dims >= 0) & (di >= 0)
        if topo_dim is not None:
            keep &= dims == topo_dim
        flat = np.asarray(img, np.float32).reshape(-1)
        dgm = np.stack([flat[np.clip(bi, 0, None)],
                        flat[np.clip(di, 0, None)]], -1).astype(np.float32)
        return dgm, keep, bi, di, dims

    def one(s):
        d1, m1, bi, di, dims1 = finite_bars(pred[s])
        d2, m2, _, _, dims2 = finite_bars(target[s])
        if topo_dim is None:
            # all-dims mode: match per homology dimension (H0 specks can
            # never pair with H2 voids), costs aggregated jointly
            from ..ops.wasserstein import _host_match_per_dim
            match1, match2 = _host_match_per_dim(d1, m1, dims1,
                                                 d2, m2, dims2, q)
        else:
            match1, match2 = _host_match(d1, m1, d2, m2, q)
        valid[s] = match1 != -2
        b_idx[s] = np.where(valid[s], bi, -1)
        d_idx[s] = np.where(valid[s], di, -1)
        diag[s] = match1 == -1
        matched = match1 >= 0
        partner[s][matched] = d2[np.clip(match1, 0, None)][matched]
        unmatched2 = match2 == -1
        const[s] = ((np.abs(d2[:, 1] - d2[:, 0]) / 2.0) ** q)[
            unmatched2].sum()

    # the C++ reduction (ctypes) and scipy's LAP release the GIL — batch
    # elements run concurrently (the reference serializes its python loop)
    if B > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(min(B, 8)) as pool:
            list(pool.map(one, range(B)))
    else:
        one(0)
    return {"b_idx": b_idx, "d_idx": d_idx, "partner": partner,
            "diag": diag, "valid": valid, "const": const}


def topo_loss_from_match(pred: jnp.ndarray, match: dict, q: float = 2.0
                         ) -> jnp.ndarray:
    """Device half of the two-phase topological loss: assemble the
    q-Wasserstein value differentiably from the pooled prediction and the
    host match data of ``topo_match_host``. Gradients reach exactly the
    critical voxels (the same routing as the single-jit
    ``topo_wasserstein`` — equivalence is asserted in
    tests/test_topology.py)."""

    def one(p, b_idx, d_idx, partner, diag, valid, const):
        flat = p.reshape(-1).astype(jnp.float32)
        b = jnp.take(flat, jnp.clip(b_idx, 0), fill_value=0.0)
        d = jnp.take(flat, jnp.clip(d_idx, 0), fill_value=0.0)
        pair_cost = jnp.max(jnp.abs(jnp.stack([b, d], -1) - partner),
                            -1) ** q
        diag_cost = (jnp.abs(d - b) / 2.0) ** q
        cost = jnp.where(valid, jnp.where(diag, diag_cost, pair_cost), 0.0)
        total = cost.sum() + const
        # same zero-total gradient guard as ops/wasserstein.py:
        # d(x^(1/q))/dx → ∞ at x = 0 (empty diagrams ⇒ NaN grads)
        safe = jnp.maximum(total, 1e-12) ** (1.0 / q)
        return jnp.where(total > 0, safe, 0.0)

    return jax.vmap(one)(pred, match["b_idx"], match["d_idx"],
                         match["partner"], match["diag"], match["valid"],
                         match["const"]).mean()


def dummy_topo_match(batch: int, cap: int):
    """Zero-cost placeholder match pytree (static shapes) for steps whose
    topological term is disabled or computed through the callback path."""
    import numpy as np
    return {"b_idx": np.full((batch, cap), -1, np.int32),
            "d_idx": np.full((batch, cap), -1, np.int32),
            "partner": np.zeros((batch, cap, 2), np.float32),
            "diag": np.zeros((batch, cap), bool),
            "valid": np.zeros((batch, cap), bool),
            "const": np.zeros((batch,), np.float32)}


def topo_wasserstein(pred: jnp.ndarray, target: jnp.ndarray,
                     topo_dim: Optional[int] = 2, q: float = 2.0,
                     cap: int = 512,
                     downsample: Optional[Sequence[int]] = None,
                     pool_mode: str = "avg") -> jnp.ndarray:
    """Per-sample cubical-Wasserstein topo loss, mean over batch.

    pred/target: (B, *spatial) probability maps / one-hot masks.
    topo_dim selects the homology dimension compared (the MVD trainer uses
    d=2, MVDTrainer.py:93 topo_feat_d); None compares all dims jointly.
    """
    maxdim = pred.ndim - 2

    def one(p, t):
        p = _maybe_pool(p, downsample, pool_mode)
        t = _maybe_pool(t, downsample, pool_mode)
        # only_dim keeps the cap for the compared dimension's strongest
        # bars (dim-0/1 bars otherwise starve a small cap on real maps)
        dp = cubical_persistence_pairs(p, maxdim=maxdim, cap=cap,
                                       only_dim=topo_dim)
        dt = cubical_persistence_pairs(t, maxdim=maxdim, cap=cap,
                                       only_dim=topo_dim)

        def sel(d):
            m = d["finite"]
            if topo_dim is not None:
                m = m & (d["dims"] == topo_dim)
            return d["birth"], d["death"], m

        b1, de1, m1 = sel(dp)
        b2, de2, m2 = sel(dt)
        if topo_dim is None:
            # all-dims mode: per-dimension matching (see topo_match_host)
            return wasserstein_distance(b1, de1, m1, b2, de2, m2, q=q,
                                        dims1=dp["dims"], dims2=dt["dims"])
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
    # only_dim: keep the cap budget for dim-d bars — without it the
    # birth-order truncation can crowd the longest dim-d bars out of a
    # small cap on noisy maps (same reasoning as topo_wasserstein)
    out = cubical_persistence_pairs(image, maxdim=max(dim, image.ndim - 1),
                                    cap=cap, superlevel=superlevel,
                                    only_dim=dim)
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


def _nips_critical_maps(like: "np.ndarray", gt: "np.ndarray",
                        topo_size: int, pers_thresh: float,
                        pers_thresh_perfect: float, cap: int):
    """Host side of the NIPS'19 topology loss (reference
    TopoLossNIPS.py:133-224 getTopoLoss): per topo_size x topo_size patch,
    dim-0 sublevel persistence of (1 - likelihood), rank-match the
    prediction's bars against the ground truth's
    (compute_dgm_force :8-90), and write the critical-pixel weight and
    reference maps:

    - holes to FIX (top-|gt| persistence, not already 'perfect'):
      birth pixel -> 0, death pixel -> 1 (in the 1-likelihood scale the
      diagram lives in; reference comments :171-180);
    - holes to REMOVE (persistence > pers_thresh, beyond the gt count):
      birth pixel -> likelihood at the death pixel and vice versa (pull
      the bar onto the diagonal, :181-218).

    Critical pixels come from the V-construction vertex pairs of the C++
    core (the reference reads gudhi T-construction top cells — same
    critical-pixel semantics, potentially one-voxel offsets)."""
    import numpy as np
    from ..ops.persistence import _host_cubical

    w_map = np.zeros_like(like, dtype=np.float32)
    r_map = np.zeros_like(like, dtype=np.float32)
    H, W = like.shape

    def crit(patch01):
        inv = (1.0 - patch01).astype(np.float32)
        dims, b_idx, d_idx = _host_cubical(inv, 0, cap, True)
        keep = (dims == 0) & (d_idx >= 0)
        b_idx, d_idx = b_idx[keep], d_idx[keep]
        flat = inv.reshape(-1)
        pd = np.stack([flat[b_idx], flat[d_idx]], 1) if b_idx.size else \
            np.zeros((0, 2), np.float32)
        return pd, b_idx, d_idx

    for y in range(0, H, topo_size):
        for x in range(0, W, topo_size):
            lp = like[y:min(y + topo_size, H), x:min(x + topo_size, W)]
            gp = gt[y:min(y + topo_size, H), x:min(x + topo_size, W)]
            if lp.min() == 1 or lp.max() == 0 or gp.min() == 1 or gp.max() == 0:
                continue
            pd_lh, bcp, dcp = crit(lp)
            pd_gt, _, _ = crit(gp)
            if pd_lh.shape[0] == 0 or pd_gt.shape[0] == 0:
                continue
            # ---- compute_dgm_force (:8-90) ----
            lh_pers = np.abs(pd_lh[:, 1] - pd_lh[:, 0])
            gt_n = pd_gt.shape[0]
            order = np.argsort(lh_pers)[::-1]
            perfect = order[:int((lh_pers > pers_thresh_perfect).sum())]
            fix_or_perfect = order[:gt_n]
            to_fix = list(set(fix_or_perfect.tolist())
                          - set(perfect.tolist()))
            to_remove = [i for i in order[gt_n:].tolist()
                         if lh_pers[i] > pers_thresh]
            pw = lp.shape[1]

            def pos(idx):
                return y + idx // pw, x + idx % pw

            for i in to_fix:
                by, bx = pos(int(bcp[i]))
                w_map[by, bx] = 1.0
                r_map[by, bx] = 0.0
                dy, dx = pos(int(dcp[i]))
                w_map[dy, dx] = 1.0
                r_map[dy, dx] = 1.0
            for i in to_remove:
                by, bx = pos(int(bcp[i]))
                dy, dx = pos(int(dcp[i]))
                w_map[by, bx] = 1.0
                r_map[by, bx] = like[dy, dx]
                w_map[dy, dx] = 1.0
                r_map[dy, dx] = like[by, bx]
    return w_map, r_map


def topo_critical_point_loss(likelihood: jnp.ndarray, target: jnp.ndarray,
                             topo_size: int = 100, cap: int = 512,
                             pers_thresh: float = 0.03,
                             pers_thresh_perfect: float = 0.99,
                             patch: Optional[int] = None) -> jnp.ndarray:
    """NIPS'19 topology loss (reference TopoLossNIPS.py getTopoLoss
    :133-224): Σ (likelihood·weight_map − ref_map)² with the critical-pixel
    maps built on the host (no gradient through the maps, exactly like the
    reference's detached numpy construction). ``likelihood`` is the
    probability map in [0, 1] (the reference's final MSE multiplies its raw
    pre-sigmoid tensor against [0,1] references — an apparent bug we do not
    reproduce); ``target`` the binary ground truth. 2D maps (batched via
    vmap outside if needed). ``patch`` is an alias for ``topo_size``."""
    import numpy as np
    if patch is not None:
        topo_size = patch
    like = likelihood.astype(jnp.float32)
    tgt = target.astype(jnp.float32)
    assert like.ndim == 2, "NIPS'19 loss is 2D (reference y/x patch loop)"

    def cb(l, t):
        return _nips_critical_maps(np.asarray(l), np.asarray(t), topo_size,
                                   pers_thresh, pers_thresh_perfect, cap)

    w_map, r_map = jax.pure_callback(
        cb,
        (jax.ShapeDtypeStruct(like.shape, jnp.float32),
         jax.ShapeDtypeStruct(like.shape, jnp.float32)),
        jax.lax.stop_gradient(like), jax.lax.stop_gradient(tgt),
        vmap_method="sequential")
    return jnp.sum((like * w_map - r_map) ** 2)
