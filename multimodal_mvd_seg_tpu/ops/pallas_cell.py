"""Pallas TPU kernels for the stride-1 s2d cell convolutions — the bench
step's hot ops (batch_running/stage_timing.py: enc0+dec4 = 122 ms of the
218 ms step, both bandwidth-bound at ~60% HBM with byte counts ~5x their
arithmetic floor).

Design (NL cell layout — channels last, C*F >= 128 on the lane axis):

    y[b, z, y, k, :] = sum_{taps p} x[b, (z,y,k) + p, :] @ W_p

Each tap is a (M, CF_in) @ (CF_in, CF_out) matmul with full 128-lane
contraction — no K padding, no im2col materialization, and the spatial
shifts are sublane/major-dim slices of the VMEM tile (free-ish), unlike
the channels-first form where XLA fences every phase-up conv with
~0.58 GB relayout copies. Measured standalone on the dec4 block1 shape
(2, 33, 65, 256, 128)->(2, 32, 64, 256, 128): 5.6 ms vs XLA's 9.0 ms
(73 vs 45 TF/s dense), bit-identical output.

Fusion: the kernel also
  - zeroes the phase-up artifact rows of the output (the rows
    ops/s2d.py::artifact_mask would zero), and
  - emits per-lane partial sums (s1, s2) of the masked f32 accumulator,
so the instance-norm statistics come out of the conv pass for free (the
separate stats-reduce re-reads disappear, and the (B, C) moments are
computed from f32 accumulators rather than the rounded bf16 output).
The norm APPLY stays in plain jnp (ops/s2d.py::apply_norm_act_from_stats)
so autodiff handles the stats coupling through the tiny (B, C) graph.

Backward is a custom VJP:
  - dx = the same conv kernel with tap-transposed/flipped weights,
  - dW = a reduction kernel accumulating x^T @ dy per tap across the
    sequential TPU grid (constant out index_map),
with the ds1/ds2 stats cotangents folded into dy on the fly.

Used by models/blocks.py::ConvNormActS2D when MVDSEG_CELL_IMPL=pallas
(TPU backends only; CPU keeps the XLA path — Pallas TPU kernels do not
run there). Reference semantics: the cell conv this replaces is
numerically the nnU-Net stride-1 3^3 conv stage
(/root/reference/nnUNet/nnunetv2/training/nnUNetTrainer/nnUNetTrainer.py
conv blocks); equivalence with the XLA cell path is pinned in
tests/test_pallas_cell.py.
"""

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# static geometry
# --------------------------------------------------------------------------

def _ceil(a, b):
    return -(-a // b)


# tests set this True to run the kernels in the Pallas interpreter on CPU
INTERPRET = False


def _pick_tiles(out_lens: Sequence[int], cf_in: int, cf_out: int,
                n_inputs: int, kc: Sequence[int]) -> Tuple[int, int, int]:
    """Output tile (t1, t2, t3). The minor cell axis t3 carries the
    sublanes; halo windows are read 8-padded so DMA sizes stay aligned.
    VMEM budget: n_inputs halo tiles (bf16) + f32 acc + bf16 out + weights.
    MVDSEG_PALLAS_TILE="t1,t2,t3" overrides (perf sweeps)."""
    import os
    env = os.environ.get("MVDSEG_PALLAS_TILE")
    if env:
        return tuple(int(v) for v in env.split(","))
    # measured on the dec4-block1 shape (v5e): (4,8,64)+dbuf = 93 TF/s vs
    # (4,8,32) 67 / (8,8,64) 76 / (4,16,64) 76 / (4,8,128) 74

    def axis_tile(L, pref, cands):
        # grid-padding rows are full MXU work on masked zeros — prefer a
        # tile with the least waste (ceil(L/t)*t - L), nearest pref
        best = None
        for c in cands:
            key = (_ceil(L, c) * c - L, abs(c - pref))
            if best is None or key < best[0]:
                best = (key, c)
        return best[1]

    t3 = 64 if out_lens[2] >= 64 else 32 if out_lens[2] >= 32 else max(
        8, 1 << int(np.floor(np.log2(max(out_lens[2], 1)))))
    if out_lens[2] >= 48 and out_lens[2] % t3:
        # minor tiles stay sublane multiples (264 -> 88, 144 -> 72)
        t3 = axis_tile(out_lens[2], 64, range(48, 129, 8))
    t2 = axis_tile(out_lens[1], 8, range(4, 11)) if out_lens[1] > 4 else 8
    t1 = axis_tile(out_lens[0], 4, range(3, 7)) if out_lens[0] > 2 else 4
    def vmem(t1, t2, t3):
        # 2x halo per input (double-buffered)
        halo = (t1 + kc[0] - 1) * (t2 + kc[1] - 1) * (t3 + 8) * cf_in * 4
        acc = t1 * t2 * t3 * cf_out * 4
        out = t1 * t2 * t3 * cf_out * 2
        w = int(np.prod(kc)) * cf_in * cf_out * 2 * n_inputs
        return n_inputs * halo + acc + out + w
    while vmem(t1, t2, t3) > 10 * 1024 * 1024 and t3 > 32:
        t3 = max(32, (t3 // 2) // 8 * 8)   # keep a sublane multiple
    while vmem(t1, t2, t3) > 10 * 1024 * 1024 and t1 > 1:
        t1 //= 2
    return t1, t2, t3


# --------------------------------------------------------------------------
# forward kernel: multi-input conv + artifact/bounds mask + stats partials
# --------------------------------------------------------------------------

def _lane_subslots(rep, cf):
    """Per-lane sub-slot index arrays for a rep's phased axes, built from
    iota (array constants cannot be captured by a pallas kernel): lane =
    c*F + f, f mixed-radix over the axes, axis 0 most significant (the
    order CellConvSpec scatters in). Returns [(axis, f, ia)] for each
    phased axis."""
    fs = [f for f, _ in rep]
    F = int(np.prod(fs))
    lam = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, cf), 3) % F
    rad = F
    out = []
    for a, (f, ph) in enumerate(rep):
        rad //= f
        if f > 1 and ph:
            out.append((a, f, (lam // rad) % f))
    return out


def _tile_valid_mask(coords, lens, off, rep, cf):
    """Validity of tile rows whose PHYSICAL per-axis coords are given, as
    an f32 0/1 mask (Mosaic rejects the relayouts wide i1 broadcast masks
    need): logical = physical - off must lie in [0, lens) and not be an
    artifact slot of ``rep`` (phase-up factor axes carry per-(cell,
    lane-subgroup) artifact slots at logical 0 / lens-1 —
    ops/s2d.py::_artifact_mask_np)."""
    lg = [c - o for c, o in zip(coords, off)]
    m = ((lg[0] >= 0) & (lg[0] < lens[0]) & (lg[1] >= 0)
         & (lg[1] < lens[1]) & (lg[2] >= 0)
         & (lg[2] < lens[2])).astype(jnp.float32)       # (..., 1)
    for a, f, ia in _lane_subslots(rep, cf):
        e0 = (lg[a] == 0).astype(jnp.float32)           # (..., 1)
        e1 = (lg[a] == lens[a] - 1).astype(jnp.float32)
        i0 = (ia == 0).astype(jnp.float32)              # (1,.., cf)
        i1 = (ia == f - 1).astype(jnp.float32)
        # per lane at most one of (ia==0, ia==f-1) holds (f > 1), so the
        # sum stays in {0, 1}
        m = m * (1.0 - (e0 * i0 + e1 * i1))
    return m


def _fwd_kernel(*refs, n_in, kc, tiles, out_lens, rep_out, cf_out,
                with_stats, dbuf, o_off=(0, 0, 0), tf=None, chain=None):
    # refs: x_0..x_{n-1} (ANY/HBM, halo-padded), [ab_in (1,2,CFi) VMEM],
    # w (VMEM, (n_in, T, CFi, CFo)), [yprev ANY], [ab_ch (1,2,CFo) VMEM],
    # o (VMEM block), [stats (VMEM block)], xt_0.., acc, [ypt], sem
    #
    # o_off: physical position of logical output cell 0 (the output may be
    #   written pre-padded for its consumer's halo sweep; the grid covers
    #   the physical extent and rows outside the logical region are zero).
    # tf: on-load transform of the single input (normalize-on-load):
    #   dict(in_lens, rep_in, x_off, slope) — x = lrelu(a*x+b) masked to
    #   the input's validity, with (a, b) from the ab_in ref.
    # chain: dgrad epilogue (the VJP of the on-load transform of the
    #   DOWNSTREAM conv): dict(lens, rep, slope) — the conv result dz is
    #   turned into dx = dz * gate * a using the y_prev center tile, and
    #   (sum dpre, sum dpre*y) accumulate into the stats block rows 0/1.
    t1, t2, t3 = tiles
    xs = refs[:n_in]
    k = n_in
    ab_in = None
    if tf is not None:
        ab_in = refs[k]
        k += 1
    w_ref = refs[k]
    k += 1
    yprev_ref = ab_ch = None
    if chain is not None:
        yprev_ref = refs[k]
        ab_ch = refs[k + 1]
        k += 2
    o_ref = refs[k]
    k += 1
    s_ref = None
    if with_stats or chain is not None:
        s_ref = refs[k]          # (1, 8, cf) block, resident per batch
        k += 1
    xts = refs[k:k + n_in]
    acc = refs[k + n_in]
    k += n_in + 1
    ypt = None
    if chain is not None:
        ypt = refs[k]
        k += 1
    sem = refs[k]

    b = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    ki = pl.program_id(3)
    h1, h2, h3 = t1 + kc[0] - 1, t2 + kc[1] - 1, t3 + 8
    n_dma = n_in + (1 if chain is not None else 0)

    def _xform(xt):
        # normalize-on-load: z = leaky_relu(a*x + b) zeroed outside the
        # input's validity (bounds + artifact slots). pre is computed in
        # f32 and rounded ONCE to the storage dtype — bf16 mul-then-add
        # would double-round, and gate signs would then differ between
        # backends (CPU bf16 rounds each op; the TPU VPU computes f32
        # internally) and from the jnp apply's reference semantics.
        cf_in = xt.shape[-1]
        # coefficients rounded to the storage dtype first — the jnp
        # apply (ops/s2d.py::apply_norm_act_from_stats) casts A/B to
        # bf16 before the elementwise, and the VJP uses the same rounded a
        a = ab_in[0, 0:1, :].reshape(1, 1, 1, cf_in) \
            .astype(xt.dtype).astype(jnp.float32)
        bb_ = ab_in[0, 1:2, :].reshape(1, 1, 1, cf_in) \
            .astype(xt.dtype).astype(jnp.float32)
        pre = (xt.astype(jnp.float32) * a + bb_).astype(xt.dtype) \
            .astype(jnp.float32)
        z = jnp.where(pre > 0, pre, jnp.float32(tf["slope"]) * pre) \
            .astype(xt.dtype)
        # physical coords of the halo rows: window base is the tile start
        coords = [jax.lax.broadcasted_iota(jnp.int32, (h1, h2, h3, 1), a_)
                  + pl.program_id(1 + a_) * tiles[a_] for a_ in range(3)]
        m = _tile_valid_mask(coords, tf["in_lens"], tf["x_off"],
                             tf["rep_in"], cf_in)
        return z * m.astype(xt.dtype)

    if dbuf:
        # double-buffered halo loads: program p starts program p+1's DMA
        # before computing, so the load rides under the MXU work. xts[i]
        # has a leading slot axis (2, h1, h2, h3, cf); sem is (2, n_dma).
        gz, gy, gk = (pl.num_programs(1), pl.num_programs(2),
                      pl.num_programs(3))
        total = pl.num_programs(0) * gz * gy * gk
        ln = ((b * gz + zi) * gy + yi) * gk + ki
        slot = jax.lax.rem(ln, 2)

        def dma(i, s, bb, zz, yy, kk):
            if i < n_in:
                return pltpu.make_async_copy(
                    xs[i].at[bb, pl.ds(zz * t1, h1), pl.ds(yy * t2, h2),
                             pl.ds(kk * t3, h3), :],
                    xts[i].at[s], sem.at[s, i])
            # chain: y_prev center tile (same physical geometry as the
            # output — bases stay aligned)
            return pltpu.make_async_copy(
                yprev_ref.at[bb, pl.ds(zz * t1, t1), pl.ds(yy * t2, t2),
                             pl.ds(kk * t3, t3), :],
                ypt.at[s], sem.at[s, n_in])

        @pl.when(ln == 0)
        def _():
            for i in range(n_dma):
                dma(i, 0, b, zi, yi, ki).start()

        ln1 = ln + 1
        k2 = jax.lax.rem(ln1, gk)
        r = ln1 // gk
        y2 = jax.lax.rem(r, gy)
        r = r // gy
        z2 = jax.lax.rem(r, gz)
        b2 = r // gz

        @pl.when(ln1 < total)
        def _():
            for i in range(n_dma):
                dma(i, jax.lax.rem(ln1, 2), b2, z2, y2, k2).start()

        for i in range(n_dma):
            dma(i, slot, b, zi, yi, ki).wait()
        if tf is not None:
            xts[0][slot] = _xform(xts[0][slot])

        def xv(i):
            return xts[i].at[slot]

        def ypv():
            return ypt[slot]
    else:
        for i in range(n_in):
            d = pltpu.make_async_copy(
                xs[i].at[b, pl.ds(zi * t1, h1), pl.ds(yi * t2, h2),
                         pl.ds(ki * t3, h3), :],
                xts[i], sem)
            d.start()
            d.wait()
        if chain is not None:
            d = pltpu.make_async_copy(
                yprev_ref.at[b, pl.ds(zi * t1, t1), pl.ds(yi * t2, t2),
                             pl.ds(ki * t3, t3), :], ypt, sem)
            d.start()
            d.wait()
        if tf is not None:
            xts[0][...] = _xform(xts[0][...])

        def xv(i):
            return xts[i]

        def ypv():
            return ypt[...]

    acc[...] = jnp.zeros_like(acc)
    # the tap operands slice the halo tile in place (sublane offsets for
    # dk included): an explicit per-dk hoist into scratch was measured
    # SLOWER (8.3 vs 6.2 ms) — Mosaic's implicit slice handling wins
    for i in range(n_in):
        for dz in range(kc[0]):
            for dy in range(kc[1]):
                for dk in range(kc[2]):
                    tap = (dz * kc[1] + dy) * kc[2] + dk
                    a = xv(i)[dz:dz + t1, dy:dy + t2, dk:dk + t3, :]
                    acc[...] += jax.lax.dot_general(
                        a, w_ref[i, tap], (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

    # bounds + artifact mask over the OUTPUT tile (physical coords; the
    # logical region sits at o_off)
    coords = [jax.lax.broadcasted_iota(jnp.int32, (t1, t2, t3, 1), a)
              + pl.program_id(1 + a) * tiles[a] for a in range(3)]
    m = _tile_valid_mask(coords, out_lens, o_off, rep_out, cf_out)
    av = acc[...] * m

    if chain is not None:
        # dz -> dx of the downstream conv's on-load transform: dpre =
        # dz * d lrelu(pre) on valid rows, dx = dpre * a; the (B, lane)
        # sums (sum dpre, sum dpre*y) are the (db, da) cotangents.
        cf = cf_out
        yp = ypv()
        a_c = ab_ch[0, 0:1, :].reshape(1, 1, 1, cf) \
            .astype(yp.dtype).astype(jnp.float32)
        b_c = ab_ch[0, 1:2, :].reshape(1, 1, 1, cf) \
            .astype(yp.dtype).astype(jnp.float32)
        ypf = yp.astype(jnp.float32)
        # pre exactly as the forward transform computes it: rounded
        # coefs, f32 mul-add rounded ONCE to the storage dtype, so the
        # gate sees the same sign (double rounding flips boundaries)
        pre = (ypf * a_c + b_c).astype(yp.dtype).astype(jnp.float32)
        # arithmetic gate in f32 (a where() with scalar branches would
        # need a replicated i1 layout, and bf16 comparisons are
        # unsupported on this target)
        slope = float(chain["slope"])
        gate = slope + (1.0 - slope) * (pre > 0).astype(jnp.float32)
        mc = _tile_valid_mask(coords, chain["lens"], o_off,
                              chain["rep"], cf)
        dpre = av * gate * mc
        av = dpre * a_c
        first = (zi == 0) & (yi == 0) & (ki == 0)

        @pl.when(first)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)

        part = jnp.stack([jnp.sum(dpre, axis=(0, 1, 2)),
                          jnp.sum(dpre * ypf, axis=(0, 1, 2))])
        s_ref[0, 0:2, :] += part

    o_ref[...] = av.astype(o_ref.dtype).reshape(o_ref.shape)
    if with_stats:
        # accumulate the masked moments into the batch's VMEM-resident
        # (1, 8, cf) stats block (constant index_map in z/y/k -> the block
        # persists across this batch's programs): row 0 = sum(y),
        # row 1 = sum(y^2), rows 2..7 unused tile padding
        first = (zi == 0) & (yi == 0) & (ki == 0)

        @pl.when(first)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)

        part = jnp.stack([jnp.sum(av, axis=(0, 1, 2)),
                          jnp.sum(av * av, axis=(0, 1, 2))])
        s_ref[0, 0:2, :] += part


def _halo_need(kc, tiles, grid):
    """Physical length each axis must have (from the padded origin) so
    every halo DMA window of the (tiles, grid) sweep is in bounds."""
    return tuple(g * t + kc[a] - 1 + (8 - kc[a] + 1 if a == 2 else 0)
                 for a, (t, g) in enumerate(zip(tiles, grid[1:])))


def _halo_padded(xs, kc, pads, tiles, grid, in_lens, o_off=(0, 0, 0),
                 need=None):
    """Pad each input so every halo window is in-bounds: axis a needs
    [o .. o + t + kc - 2] for o in [0, grid*t), relative to the padded
    array where logical cell -(pads_lo + o_off) sits at 0 (o_off: the
    output is written pre-padded, shifting every window by the same
    amount — baking the shift into the input padding keeps DMA bases
    aligned). ``need`` overrides the per-axis physical length requirement
    (callers union the forward's and the wgrad sweep's needs so the
    padded residual serves both). An input already carrying EXACTLY the
    target halo geometry (logical cell 0 at physical pads_lo + o_off,
    length == the target — e.g. the VJP reusing the forward's padded
    residuals, whose call sites build byte-identical ``need`` unions)
    passes through untouched; any other shape must be the UNPADDED
    logical lens — re-padding an already-padded array would shift its
    origin by another pads_lo + o_off and silently corrupt the conv, so
    that case asserts instead."""
    if need is None:
        need = _halo_need(kc, tiles, grid)
    xps = []
    for x in xs:
        padcfg = [(0, 0)]
        for a in range(len(tiles)):
            lo = pads[a][0] + o_off[a]
            hi = max(0, need[a] - lo - in_lens[a])
            padcfg.append((lo, hi))
        padcfg.append((0, 0))
        if tuple(x.shape[1:-1]) == tuple(
                l + lo + hi for l, (lo, hi) in zip(in_lens, padcfg[1:-1])):
            xps.append(x)
        else:
            assert tuple(x.shape[1:-1]) == tuple(in_lens), (
                "_halo_padded: input spatial shape "
                f"{tuple(x.shape[1:-1])} is neither the unpadded logical "
                f"lens {tuple(in_lens)} nor the exact padded target "
                f"{tuple(l + lo + hi for l, (lo, hi) in zip(in_lens, padcfg[1:-1]))}"
                " — refusing to re-pad what may already carry a halo")
            xps.append(jnp.pad(x, padcfg))
    return xps


def _residual_need(kc, out_lens, cf_in, cf_out, n_in, o_off, out_phys):
    """Per-axis physical x length serving BOTH the forward sweep (grid
    over out_phys, windows based at zz*t) and the wgrad sweep (grid over
    the logical out_lens, windows shifted by o_off on the major axes)."""
    t_f = _pick_tiles(out_phys, cf_in, cf_out, n_in, kc)
    g_f = (1,) + tuple(_ceil(n, t) for n, t in zip(out_phys, t_f))
    nf = _halo_need(kc, t_f, g_f)
    t_w = _pick_tiles(out_lens, cf_in, cf_out, n_in, kc)
    g_w = (1,) + tuple(_ceil(n, t) for n, t in zip(out_lens, t_w))
    nw = _halo_need(kc, t_w, g_w)
    return tuple(max(a, b + (o if i < 2 else 0))
                 for i, (a, b, o) in enumerate(zip(nf, nw, o_off)))


def consumer_pad_geometry(kc, pads, out_lens, cf_in, cf_out, n_in):
    """The halo geometry a stride-1 cell conv wants its input stored in:
    (lo, need) per axis — logical input cell 0 at physical lo = pads_lo,
    physical length >= need. A producer writing its output with
    ``out_pads`` derived from this removes the consumer's pad pass."""
    tiles = _pick_tiles(out_lens, cf_in, cf_out, n_in, kc)
    grid = (1,) + tuple(_ceil(n, t) for n, t in zip(out_lens, tiles))
    need = _halo_need(kc, tiles, grid)
    return tuple(p[0] for p in pads), need


def padded_out_geometry(kc_self, out_lens, lo, min_need, cf_a, cf_b,
                        align=True):
    """Physical geometry (o_off, phys) for writing a conv output
    pre-padded: logical 0 at ``lo`` and per-axis length covering both
    ``min_need`` (the consumer's halo need) and — when ``align`` (the
    normalize-on-load chain) — the tile-aligned sweep of the backward
    chain-dgrad over the same array (whose center-tile DMAs need phys to
    be a tile multiple)."""
    phys = tuple(max(l + n, m) for l, n, m in zip(lo, out_lens, min_need))
    if not align:
        return tuple(lo), phys
    for _ in range(4):   # fixpoint: tile choice depends on the lengths
        t_d = _pick_tiles(phys, cf_a, cf_b, 1, kc_self)
        new = tuple(_ceil(g, t) * t for g, t in zip(phys, t_d))
        if new == phys:
            break
        phys = new
    t_d = _pick_tiles(phys, cf_a, cf_b, 1, kc_self)
    if any(p % t for p, t in zip(phys, t_d)):
        # would otherwise surface later as an opaque trace-time shape
        # assert in _conv_fwd's chain path
        raise ValueError(
            "padded_out_geometry: tile-alignment fixpoint did not "
            f"converge (phys={phys}, tiles={t_d}) — this geometry cannot "
            "run the align=True chain; use fuse mode 'pad' or 'off'")
    return tuple(lo), phys


def _conv_fwd(xs, ws, kc, pads, out_lens, rep_out, with_stats,
              in_lens=None, keep_padded=False, pre_padded=False,
              o_off=(0, 0, 0), out_phys=None, tf=None, chain=None):
    """xs: list of (B, n1, n2, n3, CF_in) NL cell tensors (UNPADDED, or
    already halo-padded when in_lens gives the logical lens);
    ws: list of (T, CF_in, CF_out) tap weights; pads: per-axis (lo, hi).

    ``pre_padded``: the caller guarantees each x already carries the halo
    geometry (logical cell 0 at physical pads_lo + o_off, per-axis length
    >= the sweep's need) — possibly with MORE tail padding than this call
    needs (the backward pads dy once for both the dgrad/wgrad sweeps).
    ``o_off``/``out_phys``: write the output pre-padded — logical cell 0
    at physical o_off, physical lens out_phys, zero outside the logical
    region (removes the consumer's pad pass).
    ``tf``: normalize the single input on load — dict(ab (B, 2, CF_in)
    f32, in_lens, rep_in, x_off, slope); z = lrelu(a*x+b) masked to the
    input's validity replaces x in the taps.
    ``chain``: dgrad epilogue — dict(yprev (B, *out_phys, CF_out), ab
    (B, 2, CF_out) f32, lens, rep, slope); the conv result dz becomes
    dx = dz*gate*a and the epilogue emits (db, da) = (sum dpre,
    sum dpre*y) per (B, lane).

    Returns y (B, *out_phys, CF_out) [, s1, s2 (B, CF_out) when
    with_stats] [, db, da when chain] [, the halo-padded inputs when
    keep_padded]."""
    B = xs[0].shape[0]
    cf_in = xs[0].shape[-1]
    cf_out = ws[0].shape[-1]
    n_in = len(xs)
    assert tf is None or n_in == 1
    assert not (with_stats and chain is not None)
    if in_lens is None:
        in_lens = tuple(map(int, xs[0].shape[1:-1]))
    if out_phys is None:
        out_phys = tuple(o + n for o, n in zip(o_off, out_lens))
    t1, t2, t3 = tiles = _pick_tiles(out_phys, cf_in, cf_out, n_in, kc)
    grid = (B, _ceil(out_phys[0], t1), _ceil(out_phys[1], t2),
            _ceil(out_phys[2], t3))
    if pre_padded:
        need = _halo_need(kc, tiles, grid)
        assert all(s >= n for s, n in zip(xs[0].shape[1:-1], need)), \
            (xs[0].shape, need)
        xps = list(xs)
    else:
        xps = _halo_padded(
            xs, kc, pads, tiles, grid, in_lens, o_off,
            need=_residual_need(kc, out_lens, cf_in, cf_out, n_in,
                                o_off, out_phys))
    w_stack = jnp.stack(ws).astype(xs[0].dtype)    # (n_in, T, CFi, CFo)

    import os
    dbuf = os.environ.get("MVDSEG_PALLAS_DBUF", "1") == "1"
    tf_static = chain_static = None
    if tf is not None:
        tf_static = dict(in_lens=tuple(tf["in_lens"]),
                         rep_in=tuple(tf["rep_in"]),
                         x_off=tuple(tf["x_off"]),
                         slope=float(tf["slope"]))
    if chain is not None:
        yprev = chain["yprev"]
        assert all(s >= g * t for s, g, t in zip(
            yprev.shape[1:-1], grid[1:], tiles)), (yprev.shape, grid,
                                                   tiles)
        chain_static = dict(lens=tuple(chain["lens"]),
                            rep=tuple(chain["rep"]),
                            slope=float(chain["slope"]))
    kernel = functools.partial(
        _fwd_kernel, n_in=n_in, kc=tuple(kc), tiles=tiles,
        out_lens=tuple(out_lens), rep_out=tuple(rep_out), cf_out=cf_out,
        with_stats=with_stats, dbuf=dbuf, o_off=tuple(o_off),
        tf=tf_static, chain=chain_static)

    h1, h2, h3 = t1 + kc[0] - 1, t2 + kc[1] - 1, t3 + 8
    ab_spec = lambda cf: pl.BlockSpec((1, 2, cf),
                                      lambda b, z, y, k: (b, 0, 0),
                                      memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_in
    operands = list(xps)
    if tf is not None:
        in_specs.append(ab_spec(cf_in))
        operands.append(tf["ab"].astype(jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    operands.append(w_stack)
    if chain is not None:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY), ab_spec(cf_out)]
        operands += [yprev, chain["ab"].astype(jnp.float32)]

    out_shapes = [jax.ShapeDtypeStruct((B, *out_phys, cf_out),
                                       xs[0].dtype)]
    out_specs = [pl.BlockSpec((1, t1, t2, t3, cf_out),
                              lambda b, z, y, k: (b, z, y, k, 0),
                              memory_space=pltpu.VMEM)]
    multi_out = with_stats or chain is not None
    if multi_out:
        out_shapes.append(jax.ShapeDtypeStruct((B, 8, cf_out),
                                               jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, 8, cf_out), lambda b, z, y, k: (b, 0, 0),
            memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM(
        ((2, h1, h2, h3, cf_in) if dbuf else (h1, h2, h3, cf_in)),
        xs[0].dtype) for _ in range(n_in)]
    scratch.append(pltpu.VMEM((t1, t2, t3, cf_out), jnp.float32))
    n_dma = n_in + (1 if chain is not None else 0)
    if chain is not None:
        scratch.append(pltpu.VMEM(
            ((2, t1, t2, t3, cf_out) if dbuf else (t1, t2, t3, cf_out)),
            yprev.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2, n_dma)) if dbuf
                   else pltpu.SemaphoreType.DMA)
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if multi_out else out_specs[0],
        out_shape=out_shapes if multi_out else out_shapes[0],
        scratch_shapes=scratch,
        interpret=INTERPRET,
    )(*operands)
    if multi_out:
        y, stats = res
        if keep_padded:
            return y, stats[:, 0], stats[:, 1], xps
        return y, stats[:, 0], stats[:, 1]         # (B, CF_out) each
    return res


# --------------------------------------------------------------------------
# weight-gradient kernel: dW[i, tap] = sum_cells x_i[o + tap] dy[o]
# --------------------------------------------------------------------------

def _wgrad_kernel(*refs, n_in, kc, tiles, cf_in, cf_out, dbuf,
                  dy_off=(0, 0, 0), x_delta=(0, 0, 0), tf=None):
    # dy_off: physical position of dy's logical cell 0 (the backward's
    # once-padded dy). Axes 0/1 offset the DMA start directly; the minor
    # (sublane-tiled) axis 2 must keep aligned DMA starts, so its window
    # is read 8-extended at kk*t3 and the offset becomes an in-VMEM
    # sublane slice (dy_off[2] < 8 always: it is kc-1-pads_lo).
    # x_delta: extra physical offset of the x windows (the forward wrote
    # x with o_off > 0 and the residuals keep that geometry). Axes 0/1
    # shift the DMA base; the minor axis shifts the tap slices inside the
    # 8-slack window (x_delta[2] <= 9 - kc[2] asserted by the caller).
    # tf: normalize x on load (see _fwd_kernel) using the trailing ab ref.
    off3 = dy_off[2]
    e3 = 8 if off3 else 0
    d1, d2, d3 = x_delta
    # accumulates straight into the (constant index_map) output block,
    # which stays VMEM-resident across the sequential TPU grid — no
    # separate accumulator (at CF=256 a second copy would blow VMEM)
    t1, t2, t3 = tiles
    xs = refs[:n_in]
    dy_ref = refs[n_in]
    k = n_in + 1
    ab_in = None
    if tf is not None:
        ab_in = refs[k]
        k += 1
    dw_ref = refs[k]
    xts = refs[k + 1:k + 1 + n_in]
    dyt = refs[k + 1 + n_in]
    sem = refs[k + 2 + n_in]

    b = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    ki = pl.program_id(3)
    h1, h2, h3 = t1 + kc[0] - 1, t2 + kc[1] - 1, t3 + 8

    first = (b == 0) & (zi == 0) & (yi == 0) & (ki == 0)

    def _xform(xt, zz, yy, kk):
        # see the forward kernel's _xform: rounded coefs, f32 mul-add
        # rounded once
        cf = xt.shape[-1]
        a = ab_in[0, 0:1, :].reshape(1, 1, 1, cf) \
            .astype(xt.dtype).astype(jnp.float32)
        bb_ = ab_in[0, 1:2, :].reshape(1, 1, 1, cf) \
            .astype(xt.dtype).astype(jnp.float32)
        pre = (xt.astype(jnp.float32) * a + bb_).astype(xt.dtype) \
            .astype(jnp.float32)
        z = jnp.where(pre > 0, pre, jnp.float32(tf["slope"]) * pre) \
            .astype(xt.dtype)
        base = (zz * t1 + d1, yy * t2 + d2, kk * t3)
        coords = [jax.lax.broadcasted_iota(jnp.int32, (h1, h2, h3, 1), a_)
                  + base[a_] for a_ in range(3)]
        m = _tile_valid_mask(coords, tf["in_lens"], tf["x_off"],
                             tf["rep_in"], cf)
        return z * m.astype(xt.dtype)

    if dbuf:
        gz, gy, gk = (pl.num_programs(1), pl.num_programs(2),
                      pl.num_programs(3))
        total = pl.num_programs(0) * gz * gy * gk
        ln = ((b * gz + zi) * gy + yi) * gk + ki
        slot = jax.lax.rem(ln, 2)

        def dma(i, sl, bb, zz, yy, kk):
            if i < n_in:
                return pltpu.make_async_copy(
                    xs[i].at[bb, pl.ds(zz * t1 + d1, h1),
                             pl.ds(yy * t2 + d2, h2),
                             pl.ds(kk * t3, h3), :],
                    xts[i].at[sl], sem.at[sl, i])
            return pltpu.make_async_copy(
                dy_ref.at[bb, pl.ds(zz * t1 + dy_off[0], t1),
                          pl.ds(yy * t2 + dy_off[1], t2),
                          pl.ds(kk * t3, t3 + e3), :],
                dyt.at[sl], sem.at[sl, n_in])

        @pl.when(ln == 0)
        def _():
            for i in range(n_in + 1):
                dma(i, 0, b, zi, yi, ki).start()

        ln1 = ln + 1
        k2 = jax.lax.rem(ln1, gk)
        r = ln1 // gk
        y2 = jax.lax.rem(r, gy)
        r = r // gy
        z2 = jax.lax.rem(r, gz)
        b2 = r // gz

        @pl.when(ln1 < total)
        def _():
            for i in range(n_in + 1):
                dma(i, jax.lax.rem(ln1, 2), b2, z2, y2, k2).start()

        for i in range(n_in + 1):
            dma(i, slot, b, zi, yi, ki).wait()
        if tf is not None:
            xts[0][slot] = _xform(xts[0][slot], zi, yi, ki)

        def xv(i):
            return xts[i].at[slot]

        g = dyt[slot, :, :, off3:off3 + t3, :].reshape(
            t1 * t2 * t3, cf_out)
    else:
        for i in range(n_in):
            d = pltpu.make_async_copy(
                xs[i].at[b, pl.ds(zi * t1 + d1, h1),
                         pl.ds(yi * t2 + d2, h2),
                         pl.ds(ki * t3, h3), :], xts[i], sem)
            d.start()
            d.wait()
        d = pltpu.make_async_copy(
            dy_ref.at[b, pl.ds(zi * t1 + dy_off[0], t1),
                      pl.ds(yi * t2 + dy_off[1], t2),
                      pl.ds(ki * t3, t3 + e3), :], dyt, sem)
        d.start()
        d.wait()
        if tf is not None:
            xts[0][...] = _xform(xts[0][...], zi, yi, ki)

        def xv(i):
            return xts[i]

        g = dyt[:, :, off3:off3 + t3, :].reshape(t1 * t2 * t3, cf_out)

    @pl.when(first)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for i in range(n_in):
        for dz in range(kc[0]):
            for dy in range(kc[1]):
                for dk in range(kc[2]):
                    tap = (dz * kc[1] + dy) * kc[2] + dk
                    a = xv(i)[dz:dz + t1, dy:dy + t2,
                              dk + d3:dk + d3 + t3, :] \
                        .reshape(t1 * t2 * t3, cf_in)
                    dw_ref[i, tap] += jax.lax.dot_general(
                        a, g, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)


def _conv_wgrad(xs, dy, kc, pads, out_lens, in_lens=None,
                dy_off=(0, 0, 0), dy_pre_padded=False,
                x_delta=(0, 0, 0), tf=None, x_need=None,
                x_pre_padded=False):
    """dy: (B, *out_lens, CF_out) MASKED cotangent; xs as in _conv_fwd
    (already halo-padded when in_lens gives the logical lens).
    ``dy_pre_padded``: dy already carries logical cell 0 at physical
    ``dy_off`` with zero fill outside [0, out_lens) and enough tail room
    for the grid sweep — the backward's once-padded dy, shared with the
    dgrad conv.
    ``x_delta``: the residual x arrays carry an extra o_off from the
    forward's padded-output write — shift every x window by it.
    ``tf``: normalize x on load (dict as in _conv_fwd; the ab operand is
    appended after dy). Returns list of (T, CF_in, CF_out) f32 tap
    grads."""
    B = xs[0].shape[0]
    cf_in = xs[0].shape[-1]
    cf_out = dy.shape[-1]
    n_in = len(xs)
    assert tf is None or n_in == 1
    assert x_delta[2] <= 9 - kc[2], (x_delta, kc)
    if in_lens is None:
        in_lens = tuple(map(int, xs[0].shape[1:-1]))
    t1, t2, t3 = tiles = _pick_tiles(out_lens, cf_in, cf_out, n_in, kc)
    grid = (B, _ceil(out_lens[0], t1), _ceil(out_lens[1], t2),
            _ceil(out_lens[2], t3))
    # x windows reach grid*t + x_delta (+halo) on the major axes; pad to
    # the same union need the forward used so its residuals pass through
    need_x = tuple(n + (d if a < 2 else 0) for a, (n, d) in enumerate(
        zip(_halo_need(kc, tiles, grid), x_delta)))
    if x_need is not None:
        need_x = tuple(max(a, b) for a, b in zip(need_x, x_need))
    if x_pre_padded:
        xps = list(xs)
    else:
        xps = _halo_padded(xs, kc, pads, tiles, grid, in_lens, x_delta,
                           need=need_x)
    assert all(s >= n for s, n in zip(xps[0].shape[1:-1], need_x)), \
        (xps[0].shape, need_x, x_delta)
    e3 = 8 if dy_off[2] else 0
    if dy_pre_padded:
        need_dy = (dy_off[0] + grid[1] * t1, dy_off[1] + grid[2] * t2,
                   grid[3] * t3 + e3)
        assert all(s >= n for s, n in zip(dy.shape[1:-1], need_dy)), \
            (dy.shape, need_dy)
        dyp = dy
    else:
        # dy padded to the grid (out-of-bounds rows must be ZERO: they
        # are, because dy is already masked and jnp.pad zero-fills)
        dy_off = (0, 0, 0)
        dyp = jnp.pad(dy, [(0, 0)] + [
            (0, g * t - n) for g, t, n in zip(grid[1:], tiles, out_lens)]
            + [(0, 0)])

    import os
    dbuf = os.environ.get("MVDSEG_PALLAS_DBUF", "1") == "1"
    T = int(np.prod(kc))
    tf_static = None
    if tf is not None:
        tf_static = dict(in_lens=tuple(tf["in_lens"]),
                         rep_in=tuple(tf["rep_in"]),
                         x_off=tuple(tf["x_off"]),
                         slope=float(tf["slope"]))
    kernel = functools.partial(_wgrad_kernel, n_in=n_in, kc=tuple(kc),
                               tiles=tiles, cf_in=cf_in, cf_out=cf_out,
                               dbuf=dbuf, dy_off=tuple(dy_off),
                               x_delta=tuple(x_delta), tf=tf_static)
    h1, h2, h3 = t1 + kc[0] - 1, t2 + kc[1] - 1, t3 + 8
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * (n_in + 1)
    operands = [*xps, dyp]
    if tf is not None:
        in_specs.append(pl.BlockSpec((1, 2, cf_in),
                                     lambda b, z, y, k: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(tf["ab"].astype(jnp.float32))
    dw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_in, T, cf_in, cf_out),
                               lambda b, z, y, k: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_in, T, cf_in, cf_out),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM(
            ((2, h1, h2, h3, cf_in) if dbuf else (h1, h2, h3, cf_in)),
            xs[0].dtype) for _ in range(n_in)]
        + [pltpu.VMEM(((2, t1, t2, t3 + e3, cf_out) if dbuf
                       else (t1, t2, t3 + e3, cf_out)), dy.dtype),
           pltpu.SemaphoreType.DMA((2, n_in + 1)) if dbuf
           else pltpu.SemaphoreType.DMA],
        interpret=INTERPRET,
    )(*operands)
    return [dw[i] for i in range(n_in)]


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def cell_conv_stats(xs: Tuple[jnp.ndarray, ...],
                    ws: Tuple[jnp.ndarray, ...],
                    kc: Tuple[int, ...],
                    pads: Tuple[Tuple[int, int], ...],
                    out_lens: Tuple[int, ...],
                    rep_out: Tuple[Tuple[int, int], ...],
                    in_lens: Tuple[Tuple[int, ...], ...],
                    need_dx: bool = True,
                    out_pads=None,
                    x_off=None):
    """Stride-1 NL cell conv over one or more (x, w) contributions summed,
    with the phase artifact rows of the output zeroed and per-(B, lane)
    f32 moments (s1, s2) of the masked output emitted from the same pass.

    xs[i]: (B, *in_lens[i], CF_in) bf16; ws[i]: (T, CF_in, CF_out).
    Returns (y, s1, s2): y (B, *out_lens, CF_out) bf16, s (B, CF_out) f32.

    ``need_dx=False`` skips the dgrad conv in the VJP and returns zero
    input cotangents — for entry convs whose input is the (non-trained)
    image, where the dx conv would be pure waste (XLA then DCEs the whole
    zero path).

    ``out_pads`` = (o_off, out_phys): write y pre-padded — logical cell 0
    at physical o_off, physical lens out_phys, zeros outside the logical
    region — so the consuming conv's pad pass disappears (it reads the
    array as its halo-padded input directly). Use
    ``consumer_pad_geometry``/``padded_out_geometry`` to derive it.

    ``x_off``: the SINGLE input is already stored pre-padded with its
    logical cell 0 at physical x_off (a producer's out_pads write); must
    equal pads_lo + o_off per axis so DMA bases stay aligned. The VJP
    then writes dx in the same padded geometry.
    """
    o_off, out_phys = out_pads if out_pads is not None else \
        ((0, 0, 0), None)
    if x_off is not None:
        assert len(xs) == 1
        assert tuple(x_off) == tuple(
            p[0] + o for p, o in zip(pads, o_off)), (x_off, pads, o_off)
    return _conv_fwd(list(xs), list(ws), kc, pads, out_lens, rep_out,
                     True, in_lens=tuple(in_lens[0]),
                     pre_padded=x_off is not None,
                     o_off=o_off, out_phys=out_phys)


def _ccs_fwd(xs, ws, kc, pads, out_lens, rep_out, in_lens, need_dx,
             out_pads, x_off):
    # keep the halo-PADDED inputs as residuals: wgrad consumes the same
    # padded geometry, so saving xps instead of xs removes one full
    # pad pass (read+write of each input) from every backward
    o_off, out_phys = out_pads if out_pads is not None else \
        ((0, 0, 0), None)
    y, s1, s2, xps = _conv_fwd(list(xs), list(ws), kc, pads, out_lens,
                               rep_out, True, keep_padded=True,
                               in_lens=(tuple(in_lens[0])
                                        if x_off is not None else None),
                               pre_padded=x_off is not None,
                               o_off=o_off, out_phys=out_phys)
    return (y, s1, s2), (tuple(xps), ws, y)


def _fold_dy(dy, ds1, ds2, y, out_lens, rep_out, o_off, phys, dtype):
    """One elementwise pass: fold the stats cotangents into dy and zero
    everything outside the logical region (bounds + artifact slots).
    dy/y carry the (o_off, phys) padded geometry."""
    dyf = dy.astype(jnp.float32)
    if ds1 is not None:
        dyf = dyf + ds1[:, None, None, None, :]
    if ds2 is not None:
        dyf = dyf + 2.0 * ds2[:, None, None, None, :] * y.astype(
            jnp.float32)
    msk = _out_mask(out_lens, rep_out, dyf.shape[-1], dyf.dtype,
                    o_off=o_off, phys=phys)
    return (dyf * msk).astype(dtype)


def _sweep_dy_geometry(kc, pads, out_lens, cf_in, cf_out, n_in, need_dx,
                       in_lens, extra_off=(0, 0, 0)):
    """(lo, need, dpads) for the backward's shared dy array: the dgrad
    conv wants logical cell 0 at physical dpads_lo + extra_off (extra_off
    = the dgrad output's own o_off, keeping its DMA bases aligned); the
    wgrad sweep reads windows at that same offset (majors) / via the
    8-slack minor window. need = per-axis physical length covering both."""
    dpads = tuple((k - 1 - plo, k - 1 - phi)
                  for k, (plo, phi) in zip(kc, pads))
    lo = tuple(p[0] + e for p, e in zip(dpads, extra_off)) if need_dx \
        else (0,) * len(kc)
    t_w = _pick_tiles(out_lens, cf_in, cf_out, n_in, kc)
    need = [o + _ceil(n, t) * t for o, n, t in zip(lo, out_lens, t_w)]
    if lo[2]:
        need[2] = _ceil(out_lens[2], t_w[2]) * t_w[2] + 8
    return lo, need, dpads


def _shape_dyp(dyf, o_off, phys, lo, need, out_lens):
    """Bring the folded dy from its (o_off, phys) geometry to the sweep
    geometry (logical 0 at lo, length >= need): identity when they already
    agree, else one pad (and, for mismatched offsets, a slice first)."""
    if tuple(o_off) == tuple(lo):
        tail = [max(0, n - s) for n, s in zip(need, dyf.shape[1:-1])]
        if not any(tail):
            return dyf
        return jnp.pad(dyf, [(0, 0)] + [(0, t) for t in tail] + [(0, 0)])
    if any(o_off):
        dyf = dyf[tuple([slice(None)] + [
            slice(o, o + n) for o, n in zip(o_off, out_lens)])]
    return jnp.pad(dyf, [(0, 0)] + [
        (l, n - l - s) for l, n, s in zip(lo, need, out_lens)] + [(0, 0)])


def _ccs_bwd(kc, pads, out_lens, rep_out, in_lens, need_dx, out_pads,
             x_off, res, cts):
    xs, ws, y = res
    dy, ds1, ds2 = cts
    cf_out = dy.shape[-1]
    cf_in = xs[0].shape[-1]
    n_in = len(xs)
    o_off, phys = out_pads if out_pads is not None else \
        ((0, 0, 0), tuple(out_lens))
    xo = tuple(x_off) if x_off is not None else (0,) * len(kc)
    # stats cotangents fold elementwise into dy; y's artifact rows are
    # already zero so the mask is implicit in y, but dy itself must be
    # masked (downstream may carry nonzero cotangent on artifact rows —
    # e.g. through the exit apply's bias term).
    dyf = _fold_dy(dy, ds1, ds2, y, out_lens, rep_out, o_off, phys,
                   xs[0].dtype)
    # one dy array for both backward sweeps (the dgrad conv's o_off is
    # the pre-padded input's own offset, so dx comes back in the input's
    # physical geometry)
    lo, need, dpads = _sweep_dy_geometry(kc, pads, out_lens, cf_in,
                                         cf_out, n_in, need_dx, in_lens,
                                         extra_off=xo)
    if need_dx:
        for i, il in enumerate(in_lens):
            dl = tuple(xs[i].shape[1:-1]) if x_off is not None \
                else tuple(il)
            t_d = _pick_tiles(dl, cf_out, cf_in, 1, kc)
            g_d = (1,) + tuple(_ceil(n, t) for n, t in zip(dl, t_d))
            nd = _halo_need(kc, t_d, g_d)
            need = [max(n, m) for n, m in zip(need, nd)]
    dyp = _shape_dyp(dyf, o_off, phys, lo, need, out_lens)

    # dx_i: conv of dy with tap-reversed, io-transposed weights; pads
    # flip to dpads; output lens = in_lens[i]; phases of the INPUT rep...
    # dx must not be masked (the fwd reads all input rows, including
    # artifact rows — their cotangent is legitimately nonzero only
    # through pads; mask with the input's own validity is WRONG here:
    # fwd consumed those rows, so keep whatever the conv produces).
    dws = _conv_wgrad(list(xs), dyp, kc, pads, out_lens,
                      in_lens=tuple(in_lens[0]), dy_off=lo,
                      dy_pre_padded=True, x_delta=tuple(o_off),
                      x_need=_residual_need(kc, out_lens, cf_in, cf_out,
                                            n_in, o_off, phys),
                      x_pre_padded=x_off is not None)
    dxs = []
    for i, (x, w) in enumerate(zip(xs, ws)):
        if not need_dx:
            # entry conv from the image: the zero cotangent is DCE'd
            dxs.append(jnp.zeros(x.shape, x.dtype))
            continue
        wt = jnp.flip(w, axis=0).transpose(0, 2, 1)   # (T, CFo, CFi)
        if x_off is not None:
            dx = _conv_fwd([dyp], [wt], kc, dpads, tuple(in_lens[i]),
                           ((1, 0),) * len(kc), False, in_lens=out_lens,
                           pre_padded=True, o_off=xo,
                           out_phys=tuple(x.shape[1:-1]))
        else:
            dx = _conv_fwd([dyp], [wt], kc, dpads, tuple(in_lens[i]),
                           ((1, 0),) * len(kc), False, in_lens=out_lens,
                           pre_padded=True)
        dxs.append(dx.astype(x.dtype))
    return tuple(dxs), tuple(dw.astype(w.dtype)
                             for dw, w in zip(dws, ws))


cell_conv_stats.defvjp(_ccs_fwd, _ccs_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11))
def cell_conv_norm_stats(x: jnp.ndarray,
                         ab: jnp.ndarray,
                         w: jnp.ndarray,
                         kc: Tuple[int, ...],
                         pads: Tuple[Tuple[int, int], ...],
                         out_lens: Tuple[int, ...],
                         rep_out: Tuple[Tuple[int, int], ...],
                         in_lens: Tuple[int, ...],
                         rep_in: Tuple[Tuple[int, int], ...],
                         x_off: Tuple[int, ...],
                         slope: float = 0.01,
                         out_pads=None):
    """Normalize-on-load stride-1 cell conv: the taps consume
    z = leaky_relu(a*x + b) zeroed outside the input's validity (bounds
    + artifact slots of rep_in), where (a, b) = ab[:, 0], ab[:, 1] are
    per-(B, lane) f32 coefficients — the instance-norm apply of the
    PREVIOUS conv folded into this conv's tile loads, so the activated
    tensor never exists in HBM (reference semantics: the conv→IN→lrelu
    chains of nnU-Net conv blocks, nnUNetTrainer.py conv stages).

    x: (B, *phys_in, CF_in) RAW previous output, PRE-PADDED with logical
    cell 0 at physical ``x_off`` — which must equal pads_lo + o_off so
    every DMA base stays tile-aligned (the producer writes this geometry
    via ``out_pads``). Returns (y, s1, s2) like cell_conv_stats.

    The VJP runs the whole apply-chain in kernels: the dgrad conv's
    epilogue turns dz into dx = dz*gate*a using x center tiles and emits
    (db, da) per (B, lane); the wgrad kernel re-applies the transform to
    its x tiles. One elementwise fold pass per layer remains in XLA.
    """
    o_off, out_phys = out_pads if out_pads is not None else \
        ((0, 0, 0), None)
    assert tuple(x_off) == tuple(p[0] + o for p, o in zip(pads, o_off)), \
        (x_off, pads, o_off)
    tf = dict(ab=ab, in_lens=in_lens, rep_in=rep_in, x_off=x_off,
              slope=slope)
    return _conv_fwd([x], [w], kc, pads, out_lens, rep_out, True,
                     in_lens=in_lens, pre_padded=True, o_off=o_off,
                     out_phys=out_phys, tf=tf)


def _ccns_fwd(x, ab, w, kc, pads, out_lens, rep_out, in_lens, rep_in,
              x_off, slope, out_pads):
    out = cell_conv_norm_stats(x, ab, w, kc, pads, out_lens, rep_out,
                               in_lens, rep_in, x_off, slope, out_pads)
    return out, (x, ab, w, out[0])


def _ccns_bwd(kc, pads, out_lens, rep_out, in_lens, rep_in, x_off,
              slope, out_pads, res, cts):
    x, ab, w, y = res
    dy, ds1, ds2 = cts
    cf_out = dy.shape[-1]
    cf_in = x.shape[-1]
    o_off, phys = out_pads if out_pads is not None else \
        ((0, 0, 0), tuple(out_lens))
    x_phys = tuple(map(int, x.shape[1:-1]))
    dyf = _fold_dy(dy, ds1, ds2, y, out_lens, rep_out, o_off, phys,
                   x.dtype)
    # the chain dgrad writes dx in x's physical geometry (o_off = x_off,
    # out_phys = x_phys — tile-aligned by padded_out_geometry), so its
    # own dy array wants logical 0 at dpads_lo + x_off
    lo, need, dpads = _sweep_dy_geometry(kc, pads, out_lens, cf_in,
                                         cf_out, 1, True, (in_lens,),
                                         extra_off=x_off)
    t_d = _pick_tiles(x_phys, cf_out, cf_in, 1, kc)
    g_d = (1,) + tuple(_ceil(n, t) for n, t in zip(x_phys, t_d))
    need = [max(n, m) for n, m in zip(need, _halo_need(kc, t_d, g_d))]
    dyp = _shape_dyp(dyf, o_off, phys, lo, need, out_lens)

    tf = dict(ab=ab, in_lens=in_lens, rep_in=rep_in, x_off=x_off,
              slope=slope)
    wt = jnp.flip(w, axis=0).transpose(0, 2, 1)       # (T, CFo, CFi)
    dx, db, da = _conv_fwd(
        [dyp], [wt], kc, dpads, in_lens, ((1, 0),) * len(kc), False,
        in_lens=out_lens, pre_padded=True, o_off=tuple(x_off),
        out_phys=x_phys,
        chain=dict(yprev=x, ab=ab, lens=in_lens, rep=rep_in,
                   slope=slope))
    dws = _conv_wgrad([x], dyp, kc, pads, out_lens, in_lens=in_lens,
                      dy_off=lo, dy_pre_padded=True, tf=tf,
                      x_pre_padded=True)
    dab = jnp.stack([da, db], axis=1).astype(ab.dtype)  # (B, 2, CF_in)
    return (dx.astype(x.dtype), dab, dws[0].astype(w.dtype))


cell_conv_norm_stats.defvjp(_ccns_fwd, _ccns_bwd)


def _out_mask(out_lens, rep_out, cf, dtype, o_off=(0, 0, 0), phys=None):
    """(1, *phys, cf) NL mask zeroing everything outside the logical
    region (bounds, when the array is stored pre-padded at o_off) and the
    phase artifact slots — the per-(cell, sub-slot) structure of
    ops/s2d.py::_artifact_mask_np, broadcast per logical channel over the
    lane axis. Built from iota so no full-size constant is embedded in
    the program (a materialized dec4-shaped f32 mask is ~0.3 GB of HLO
    constant)."""
    if phys is None:
        phys = tuple(o + n for o, n in zip(o_off, out_lens))
    shape = (1, *phys, cf)
    m = None
    if tuple(phys) != tuple(out_lens) or any(o_off):
        for a in range(3):
            ca = jax.lax.broadcasted_iota(jnp.int32, shape, 1 + a)
            bad = (ca < o_off[a]) | (ca >= o_off[a] + out_lens[a])
            m = bad if m is None else (m | bad)
    fs = [f for f, _ in rep_out]
    F = int(np.prod(fs))
    lam = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1) % F
    rad = F
    for a, (f, ph) in enumerate(rep_out):
        rad //= f
        if f > 1 and ph:
            ca = jax.lax.broadcasted_iota(jnp.int32, shape, 1 + a)
            ia = (lam // rad) % f
            bad = (((ca == o_off[a]) & (ia == 0))
                   | ((ca == o_off[a] + out_lens[a] - 1) & (ia == f - 1)))
            m = bad if m is None else (m | bad)
    if m is None:
        return jnp.ones(shape, dtype)
    return jnp.where(m, jnp.zeros((), dtype), jnp.ones((), dtype))


# --------------------------------------------------------------------------
# reference (pure jnp) — for tests and CPU fallback of the same semantics
# --------------------------------------------------------------------------

def cell_conv_stats_reference(xs, ws, kc, pads, out_lens, rep_out,
                              in_lens, out_pads=None):
    """Same contract as cell_conv_stats via lax.conv (NL dimension
    numbers) — used by tests to pin the Pallas kernels."""
    y = None
    for x, w in zip(xs, ws):
        # w (T, CFi, CFo) -> OIDHW (CFo, CFi, *kc); f32 throughout (the
        # bf16->f32 casts are exact, and uniform dtypes keep the conv
        # transpose rule happy under jax.grad)
        wc = jnp.moveaxis(w.reshape(*kc, *w.shape[1:]), (3, 4), (1, 0))
        yi = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), wc.astype(jnp.float32),
            (1,) * len(kc), list(pads),
            dimension_numbers=("NDHWC", "OIDHW", "NDHWC"),
            precision=jax.lax.Precision.HIGHEST)
        y = yi if y is None else y + yi
    y = y * _out_mask(out_lens, rep_out, y.shape[-1], y.dtype)
    s1 = y.sum(axis=(1, 2, 3))
    s2 = (y * y).sum(axis=(1, 2, 3))
    if out_pads is not None:
        o_off, phys = out_pads
        y = jnp.pad(y, [(0, 0)] + [
            (o, p - o - n) for o, p, n in zip(o_off, phys, out_lens)]
            + [(0, 0)])
    return y.astype(xs[0].dtype), s1, s2


def norm_act_reference(x, ab, in_lens, rep_in, x_off, slope=0.01):
    """The on-load transform alone (reference semantics): slice the
    logical region out of the pre-padded x, z = leaky_relu(a*x + b) with
    the pre-activation rounded to x's dtype (so the gate sees the same
    bf16 sign the kernels do), artifact slots of rep_in zeroed. The
    differentiable graph stays f32 past the rounding — the kernels
    accumulate the (da, db) reductions in f32, and a bf16-accumulating
    autodiff reference would quantize them to garbage."""
    xl = x[(slice(None),) + tuple(
        slice(o, o + n) for o, n in zip(x_off, in_lens))]
    af = ab[:, 0].astype(x.dtype).astype(jnp.float32)[
        :, None, None, None, :]
    bf = ab[:, 1].astype(x.dtype).astype(jnp.float32)[
        :, None, None, None, :]
    xf = xl.astype(jnp.float32)
    pre = xf * af + bf
    # straight-through bf16 rounding: the VALUES match the kernels' bf16
    # elementwise transform, but the gradient stays f32 — a plain
    # .astype(bf16) would quantize the cotangents to bf16 and the
    # broadcast reductions for (da, db) would then accumulate in bf16
    # (saturating around 2^23), which the kernels' f32 accumulators
    # correctly avoid
    pre = pre + jax.lax.stop_gradient(
        pre.astype(x.dtype).astype(jnp.float32) - pre)
    z = jnp.where(pre > 0, pre, jnp.float32(slope) * pre)
    z = z + jax.lax.stop_gradient(
        z.astype(x.dtype).astype(jnp.float32) - z)
    return z * _out_mask(in_lens, rep_in, x.shape[-1], jnp.float32)


def cell_conv_norm_stats_reference(x, ab, w, kc, pads, out_lens, rep_out,
                                   in_lens, rep_in, x_off, slope=0.01,
                                   out_pads=None):
    """cell_conv_norm_stats via the plain reference pieces."""
    z = norm_act_reference(x, ab, in_lens, rep_in, x_off, slope)
    return cell_conv_stats_reference((z,), (w,), kc, pads, out_lens,
                                     rep_out, (in_lens,), out_pads)
