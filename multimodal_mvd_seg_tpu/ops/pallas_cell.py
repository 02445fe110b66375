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
    t3 = 64 if out_lens[2] >= 64 else 32 if out_lens[2] >= 32 else max(
        8, 1 << int(np.floor(np.log2(max(out_lens[2], 1)))))
    t2 = 8
    t1 = 4
    def vmem(t1, t2, t3):
        # 2x halo per input (double-buffered)
        halo = (t1 + kc[0] - 1) * (t2 + kc[1] - 1) * (t3 + 8) * cf_in * 4
        acc = t1 * t2 * t3 * cf_out * 4
        out = t1 * t2 * t3 * cf_out * 2
        w = int(np.prod(kc)) * cf_in * cf_out * 2 * n_inputs
        return n_inputs * halo + acc + out + w
    while vmem(t1, t2, t3) > 10 * 1024 * 1024 and t3 > 32:
        t3 //= 2
    while vmem(t1, t2, t3) > 10 * 1024 * 1024 and t1 > 1:
        t1 //= 2
    return t1, t2, t3


# --------------------------------------------------------------------------
# forward kernel: multi-input conv + artifact/bounds mask + stats partials
# --------------------------------------------------------------------------

def _fwd_kernel(*refs, n_in, kc, tiles, out_lens, rep_out, cf_out,
                with_stats, dbuf):
    # refs: x_0..x_{n-1} (ANY/HBM, halo-padded), w (VMEM, (n_in, T, CFi,
    # CFo)), o (VMEM block), [stats (VMEM block)], xt_0.., acc, [dkh], sem
    t1, t2, t3 = tiles
    xs = refs[:n_in]
    w_ref = refs[n_in]
    o_ref = refs[n_in + 1]
    k = n_in + 2
    if with_stats:
        s_ref = refs[k]          # (1, 8, cf) block, resident per batch
        k += 1
    xts = refs[k:k + n_in]
    acc = refs[k + n_in]
    sem = refs[k + n_in + 1]

    b = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    ki = pl.program_id(3)
    h1, h2, h3 = t1 + kc[0] - 1, t2 + kc[1] - 1, t3 + 8

    if dbuf:
        # double-buffered halo loads: program p starts program p+1's DMA
        # before computing, so the load rides under the MXU work. xts[i]
        # has a leading slot axis (2, h1, h2, h3, cf); sem is (2, n_in).
        gz, gy, gk = (pl.num_programs(1), pl.num_programs(2),
                      pl.num_programs(3))
        total = pl.num_programs(0) * gz * gy * gk
        ln = ((b * gz + zi) * gy + yi) * gk + ki
        slot = jax.lax.rem(ln, 2)

        def dma(i, s, bb, zz, yy, kk):
            return pltpu.make_async_copy(
                xs[i].at[bb, pl.ds(zz * t1, h1), pl.ds(yy * t2, h2),
                         pl.ds(kk * t3, h3), :],
                xts[i].at[s], sem.at[s, i])

        @pl.when(ln == 0)
        def _():
            for i in range(n_in):
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
            for i in range(n_in):
                dma(i, jax.lax.rem(ln1, 2), b2, z2, y2, k2).start()

        for i in range(n_in):
            dma(i, slot, b, zi, yi, ki).wait()

        def xv(i):
            return xts[i].at[slot]
    else:
        for i in range(n_in):
            dma = pltpu.make_async_copy(
                xs[i].at[b, pl.ds(zi * t1, h1), pl.ds(yi * t2, h2),
                         pl.ds(ki * t3, h3), :],
                xts[i], sem)
            dma.start()
            dma.wait()

        def xv(i):
            return xts[i]

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

    # bounds + artifact mask over the OUTPUT tile. Bounds: cells beyond
    # out_lens (grid padding) are invalid. Artifacts: a phase-1 factor-f
    # axis carries artifact SLOTS (sub-index i == 0 at cell 0, i == f-1 at
    # cell n-1) — per (cell, lane-subgroup) pairs, NOT whole cells
    # (ops/s2d.py::_artifact_mask_np).
    coords = [jax.lax.broadcasted_iota(jnp.int32, (t1, t2, t3, 1), a)
              + pl.program_id(1 + a) * tiles[a] for a in range(3)]
    m = ((coords[0] < out_lens[0]) & (coords[1] < out_lens[1])
         & (coords[2] < out_lens[2]))
    # per-lane sub-slot indices built from iota (array constants cannot be
    # captured by a pallas kernel): lane = c*F + f, f mixed-radix over the
    # axes, axis 0 most significant (the order CellConvSpec scatters in)
    fs = [f for f, _ in rep_out]
    F = int(np.prod(fs))
    lam = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, cf_out), 3) % F
    rad = F
    for a, (f, ph) in enumerate(rep_out):
        rad //= f
        if f > 1 and ph:
            ia = (lam // rad) % f
            bad = (((coords[a] == 0) & (ia == 0))
                   | ((coords[a] == out_lens[a] - 1) & (ia == f - 1)))
            m = m & ~bad
    av = jnp.where(m, acc[...], 0.0)
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


def _halo_padded(xs, kc, pads, tiles, grid, in_lens):
    """Pad each input so every halo window is in-bounds: axis a needs
    [o .. o + t + kc - 2] for o in [0, grid*t), relative to the padded
    array where logical cell -pads_lo sits at 0. An input already carrying
    the halo geometry (logical cell 0 at physical pads_lo, length >= need
    — e.g. the VJP reusing the forward's padded residuals, or the
    backward's once-padded dy) passes through untouched."""
    need = _halo_need(kc, tiles, grid)
    xps = []
    for x in xs:
        padcfg = [(0, 0)]
        for a in range(len(tiles)):
            lo = pads[a][0]
            hi = max(0, need[a] - lo - in_lens[a])
            padcfg.append((lo, hi))
        padcfg.append((0, 0))
        if tuple(x.shape[1:-1]) == tuple(
                l + lo + hi for l, (lo, hi) in zip(in_lens, padcfg[1:-1])):
            xps.append(x)
        else:
            xps.append(jnp.pad(x, padcfg))
    return xps


def _conv_fwd(xs, ws, kc, pads, out_lens, rep_out, with_stats,
              in_lens=None, keep_padded=False, pre_padded=False):
    """xs: list of (B, n1, n2, n3, CF_in) NL cell tensors (UNPADDED, or
    already halo-padded when in_lens gives the logical lens);
    ws: list of (T, CF_in, CF_out) tap weights; pads: per-axis (lo, hi).
    ``pre_padded``: the caller guarantees each x already carries the halo
    geometry (logical cell 0 at physical pads_lo, per-axis length >= the
    sweep's need) — possibly with MORE tail padding than this call needs
    (the backward pads dy once for both the dgrad and wgrad sweeps).
    Returns y (B, *out_lens, CF_out) [, s1, s2 (B, CF_out)]
    [, the halo-padded inputs when keep_padded]."""
    B = xs[0].shape[0]
    cf_in = xs[0].shape[-1]
    cf_out = ws[0].shape[-1]
    n_in = len(xs)
    if in_lens is None:
        in_lens = tuple(map(int, xs[0].shape[1:-1]))
    t1, t2, t3 = tiles = _pick_tiles(out_lens, cf_in, cf_out, n_in, kc)
    grid = (B, _ceil(out_lens[0], t1), _ceil(out_lens[1], t2),
            _ceil(out_lens[2], t3))
    if pre_padded:
        need = _halo_need(kc, tiles, grid)
        assert all(s >= n for s, n in zip(xs[0].shape[1:-1], need)), \
            (xs[0].shape, need)
        xps = list(xs)
    else:
        xps = _halo_padded(xs, kc, pads, tiles, grid, in_lens)
    w_stack = jnp.stack(ws).astype(xs[0].dtype)    # (n_in, T, CFi, CFo)

    import os
    dbuf = os.environ.get("MVDSEG_PALLAS_DBUF", "1") == "1"
    kernel = functools.partial(
        _fwd_kernel, n_in=n_in, kc=tuple(kc), tiles=tiles,
        out_lens=tuple(out_lens), rep_out=tuple(rep_out), cf_out=cf_out,
        with_stats=with_stats, dbuf=dbuf)

    h1, h2, h3 = t1 + kc[0] - 1, t2 + kc[1] - 1, t3 + 8
    out_shapes = [jax.ShapeDtypeStruct((B, *out_lens, cf_out),
                                       xs[0].dtype)]
    out_specs = [pl.BlockSpec((1, t1, t2, t3, cf_out),
                              lambda b, z, y, k: (b, z, y, k, 0),
                              memory_space=pltpu.VMEM)]
    if with_stats:
        out_shapes.append(jax.ShapeDtypeStruct((B, 8, cf_out),
                                               jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, 8, cf_out), lambda b, z, y, k: (b, 0, 0),
            memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_specs if with_stats else out_specs[0],
        out_shape=out_shapes if with_stats else out_shapes[0],
        scratch_shapes=[pltpu.VMEM(
            ((2, h1, h2, h3, cf_in) if dbuf else (h1, h2, h3, cf_in)),
            xs[0].dtype) for _ in range(n_in)]
        + [pltpu.VMEM((t1, t2, t3, cf_out), jnp.float32)]
        + [pltpu.SemaphoreType.DMA((2, n_in)) if dbuf
           else pltpu.SemaphoreType.DMA],
        interpret=INTERPRET,
    )(*xps, w_stack)
    if with_stats:
        y, stats = res
        if keep_padded:
            return y, stats[:, 0], stats[:, 1], xps
        return y, stats[:, 0], stats[:, 1]         # (B, CF_out) each
    return res


# --------------------------------------------------------------------------
# weight-gradient kernel: dW[i, tap] = sum_cells x_i[o + tap] dy[o]
# --------------------------------------------------------------------------

def _wgrad_kernel(*refs, n_in, kc, tiles, cf_in, cf_out, dbuf,
                  dy_off=(0, 0, 0)):
    # dy_off: physical position of dy's logical cell 0 (the backward's
    # once-padded dy). Axes 0/1 offset the DMA start directly; the minor
    # (sublane-tiled) axis 2 must keep aligned DMA starts, so its window
    # is read 8-extended at kk*t3 and the offset becomes an in-VMEM
    # sublane slice (dy_off[2] < 8 always: it is kc-1-pads_lo).
    off3 = dy_off[2]
    e3 = 8 if off3 else 0
    # accumulates straight into the (constant index_map) output block,
    # which stays VMEM-resident across the sequential TPU grid — no
    # separate accumulator (at CF=256 a second copy would blow VMEM)
    t1, t2, t3 = tiles
    xs = refs[:n_in]
    dy_ref = refs[n_in]
    dw_ref = refs[n_in + 1]
    xts = refs[n_in + 2:2 * n_in + 2]
    dyt = refs[2 * n_in + 2]
    sem = refs[2 * n_in + 3]

    b = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    ki = pl.program_id(3)
    h1, h2, h3 = t1 + kc[0] - 1, t2 + kc[1] - 1, t3 + 8

    first = (b == 0) & (zi == 0) & (yi == 0) & (ki == 0)

    if dbuf:
        gz, gy, gk = (pl.num_programs(1), pl.num_programs(2),
                      pl.num_programs(3))
        total = pl.num_programs(0) * gz * gy * gk
        ln = ((b * gz + zi) * gy + yi) * gk + ki
        slot = jax.lax.rem(ln, 2)

        def dma(i, sl, bb, zz, yy, kk):
            if i < n_in:
                return pltpu.make_async_copy(
                    xs[i].at[bb, pl.ds(zz * t1, h1), pl.ds(yy * t2, h2),
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

        def xv(i):
            return xts[i].at[slot]

        g = dyt[slot, :, :, off3:off3 + t3, :].reshape(
            t1 * t2 * t3, cf_out)
    else:
        for i in range(n_in):
            d = pltpu.make_async_copy(
                xs[i].at[b, pl.ds(zi * t1, h1), pl.ds(yi * t2, h2),
                         pl.ds(ki * t3, h3), :], xts[i], sem)
            d.start()
            d.wait()
        d = pltpu.make_async_copy(
            dy_ref.at[b, pl.ds(zi * t1 + dy_off[0], t1),
                      pl.ds(yi * t2 + dy_off[1], t2),
                      pl.ds(ki * t3, t3 + e3), :], dyt, sem)
        d.start()
        d.wait()

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
                    a = xv(i)[dz:dz + t1, dy:dy + t2, dk:dk + t3, :] \
                        .reshape(t1 * t2 * t3, cf_in)
                    dw_ref[i, tap] += jax.lax.dot_general(
                        a, g, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)


def _conv_wgrad(xs, dy, kc, pads, out_lens, in_lens=None,
                dy_off=(0, 0, 0), dy_pre_padded=False):
    """dy: (B, *out_lens, CF_out) MASKED cotangent; xs as in _conv_fwd
    (already halo-padded when in_lens gives the logical lens).
    ``dy_pre_padded``: dy already carries logical cell 0 at physical
    ``dy_off`` with zero fill outside [0, out_lens) and enough tail room
    for the grid sweep — the backward's once-padded dy, shared with the
    dgrad conv. Returns list of (T, CF_in, CF_out) f32 tap grads."""
    B = xs[0].shape[0]
    cf_in = xs[0].shape[-1]
    cf_out = dy.shape[-1]
    n_in = len(xs)
    if in_lens is None:
        in_lens = tuple(map(int, xs[0].shape[1:-1]))
    t1, t2, t3 = tiles = _pick_tiles(out_lens, cf_in, cf_out, n_in, kc)
    grid = (B, _ceil(out_lens[0], t1), _ceil(out_lens[1], t2),
            _ceil(out_lens[2], t3))
    xps = _halo_padded(xs, kc, pads, tiles, grid, in_lens)
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
    kernel = functools.partial(_wgrad_kernel, n_in=n_in, kc=tuple(kc),
                               tiles=tiles, cf_in=cf_in, cf_out=cf_out,
                               dbuf=dbuf, dy_off=tuple(dy_off))
    h1, h2, h3 = t1 + kc[0] - 1, t2 + kc[1] - 1, t3 + 8
    dw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (n_in + 1),
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
    )(*xps, dyp)
    return [dw[i] for i in range(n_in)]


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def cell_conv_stats(xs: Tuple[jnp.ndarray, ...],
                    ws: Tuple[jnp.ndarray, ...],
                    kc: Tuple[int, ...],
                    pads: Tuple[Tuple[int, int], ...],
                    out_lens: Tuple[int, ...],
                    rep_out: Tuple[Tuple[int, int], ...],
                    in_lens: Tuple[Tuple[int, ...], ...],
                    need_dx: bool = True):
    """Stride-1 NL cell conv over one or more (x, w) contributions summed,
    with the phase artifact rows of the output zeroed and per-(B, lane)
    f32 moments (s1, s2) of the masked output emitted from the same pass.

    xs[i]: (B, *in_lens[i], CF_in) bf16; ws[i]: (T, CF_in, CF_out).
    Returns (y, s1, s2): y (B, *out_lens, CF_out) bf16, s (B, CF_out) f32.

    ``need_dx=False`` skips the dgrad conv in the VJP and returns zero
    input cotangents — for entry convs whose input is the (non-trained)
    image, where the dx conv would be pure waste (XLA then DCEs the whole
    zero path).
    """
    return _conv_fwd(list(xs), list(ws), kc, pads, out_lens, rep_out,
                     True)


def _ccs_fwd(xs, ws, kc, pads, out_lens, rep_out, in_lens, need_dx):
    # keep the halo-PADDED inputs as residuals: wgrad consumes the same
    # padded geometry, so saving xps instead of xs removes one full
    # pad pass (read+write of each input) from every backward
    y, s1, s2, xps = _conv_fwd(list(xs), list(ws), kc, pads, out_lens,
                               rep_out, True, keep_padded=True)
    return (y, s1, s2), (tuple(xps), ws, y)


def _ccs_bwd(kc, pads, out_lens, rep_out, in_lens, need_dx, res, cts):
    xs, ws, y = res
    dy, ds1, ds2 = cts
    cf_out = dy.shape[-1]
    cf_in = xs[0].shape[-1]
    n_in = len(xs)
    # stats cotangents fold elementwise into dy; y's artifact rows are
    # already zero so the mask is implicit in y, but dy itself must be
    # masked (downstream may carry nonzero cotangent on artifact rows —
    # e.g. through the exit apply's bias term).
    dyf = dy.astype(jnp.float32)
    if ds1 is not None:
        dyf = dyf + ds1[:, None, None, None, :]
    if ds2 is not None:
        dyf = dyf + 2.0 * ds2[:, None, None, None, :] * y.astype(jnp.float32)
    # re-mask: zero bounds/artifact rows of dy
    msk = _out_mask(out_lens, rep_out, cf_out, dyf.dtype)
    dyf = (dyf * msk).astype(xs[0].dtype)

    # pad dy ONCE for both backward sweeps (fold + mask + pad is a single
    # XLA fusion): the dgrad conv wants halo geometry (logical cell 0 at
    # physical kc-1-pads_lo), the wgrad sweep reads windows starting at
    # that same offset — per-axis length = the union of both needs.
    dpads = tuple((k - 1 - plo, k - 1 - phi)
                  for k, (plo, phi) in zip(kc, pads))
    lo = tuple(p[0] for p in dpads) if need_dx else (0,) * len(kc)
    t_w = _pick_tiles(out_lens, cf_in, cf_out, n_in, kc)
    # wgrad sweep needs: axes 0/1 read [o*t + lo, +t); the minor axis
    # keeps aligned starts with an 8-extended window, [o*t3, +t3+8)
    need = [o + _ceil(n, t) * t for o, n, t in zip(lo, out_lens, t_w)]
    if lo[2]:
        need[2] = _ceil(out_lens[2], t_w[2]) * t_w[2] + 8
    if need_dx:
        for il in in_lens:
            t_d = _pick_tiles(tuple(il), cf_out, cf_in, 1, kc)
            g_d = (1,) + tuple(_ceil(n, t) for n, t in zip(il, t_d))
            nd = _halo_need(kc, t_d, g_d)
            need = [max(n, m) for n, m in zip(need, nd)]
    dyp = jnp.pad(dyf, [(0, 0)] + [
        (l, n - l - s) for l, n, s in zip(lo, need, out_lens)] + [(0, 0)])

    # dx_i: conv of dy with tap-reversed, io-transposed weights; pads
    # flip to dpads; output lens = in_lens[i]; phases of the INPUT rep...
    # dx must not be masked (the fwd reads all input rows, including
    # artifact rows — their cotangent is legitimately nonzero only
    # through pads; mask with the input's own validity is WRONG here:
    # fwd consumed those rows, so keep whatever the conv produces).
    dws = _conv_wgrad(list(xs), dyp, kc, pads, out_lens,
                      in_lens=tuple(in_lens[0]), dy_off=lo,
                      dy_pre_padded=True)
    dxs = []
    for i, (x, w) in enumerate(zip(xs, ws)):
        if not need_dx:
            # entry conv from the image: the zero cotangent is DCE'd
            dxs.append(jnp.zeros((x.shape[0], *in_lens[i], x.shape[-1]),
                                 x.dtype))
            continue
        wt = jnp.flip(w, axis=0).transpose(0, 2, 1)   # (T, CFo, CFi)
        dx = _conv_fwd([dyp], [wt], kc, dpads, tuple(in_lens[i]),
                       ((1, 0),) * len(kc), False, in_lens=out_lens,
                       pre_padded=True)
        dxs.append(dx.astype(x.dtype))
    return tuple(dxs), tuple(dw.astype(w.dtype)
                             for dw, w in zip(dws, ws))


cell_conv_stats.defvjp(_ccs_fwd, _ccs_bwd)


def _out_mask(out_lens, rep_out, cf, dtype):
    """(1, *out_lens, cf) NL mask zeroing the phase artifact slots — the
    per-(cell, sub-slot) structure of ops/s2d.py::_artifact_mask_np,
    broadcast per logical channel over the lane axis. Built from iota so
    no full-size constant is embedded in the program (a materialized
    dec4-shaped f32 mask is ~0.3 GB of HLO constant)."""
    shape = (1, *out_lens, cf)
    m = None
    fs = [f for f, _ in rep_out]
    F = int(np.prod(fs))
    lam = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1) % F
    rad = F
    for a, (f, ph) in enumerate(rep_out):
        rad //= f
        if f > 1 and ph:
            ca = jax.lax.broadcasted_iota(jnp.int32, shape, 1 + a)
            ia = (lam // rad) % f
            bad = (((ca == 0) & (ia == 0))
                   | ((ca == out_lens[a] - 1) & (ia == f - 1)))
            m = bad if m is None else (m | bad)
    if m is None:
        return jnp.ones(shape, dtype)
    return jnp.where(m, jnp.zeros((), dtype), jnp.ones((), dtype))


# --------------------------------------------------------------------------
# reference (pure jnp) — for tests and CPU fallback of the same semantics
# --------------------------------------------------------------------------

def cell_conv_stats_reference(xs, ws, kc, pads, out_lens, rep_out,
                              in_lens):
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
            dimension_numbers=("NDHWC", "OIDHW", "NDHWC"))
        y = yi if y is None else y + yi
    y = y * _out_mask(out_lens, rep_out, y.shape[-1], y.dtype)
    s1 = y.sum(axis=(1, 2, 3))
    s2 = (y * y).sum(axis=(1, 2, 3))
    return y.astype(xs[0].dtype), s1, s2
