"""Space-to-depth (s2d) execution domain for small-channel 3D convolutions.

WHY. The 3d_fullres U-Net's early stages run 3^3 stride-1 convs with 32/64
channels over huge spatial extents. On TPU these map terribly onto the MXU:
measured ~11 TF/s (5% of a v5e's bf16 peak) because the contraction axis
(C_in, 27 taps folded serially) and one GEMM side (C_out) are far below the
128-lane/128-row systolic tile, and bf16 lane padding wastes bandwidth in
either layout. Re-expressing the SAME convolution in a space-to-depth domain
— each pair of rows along chosen axes folded into channels — turns every
stage-0/1 conv into a C>=128 conv with a small cell kernel, which XLA runs at
37-53 TF/s on the same chip (measured, see models/blocks.py). This is the
standard TPU trick (MLPerf ResNet space-to-depth), generalized here to
*whole U-Net stages* with exact numerics:

- activations at an s2d stage live as (B, C*F, *cells) with
  channel = c*F + idx, idx row-major over per-axis sub-indices i_a in
  [0, f_a); cells_a = L_a / f_a.
- logical conv weights (Co, Ci, *k) are scattered once per shape-config into
  dense "cell kernels" (Co*F_out, Ci*F_in, *K_cell) by a precomputed gather
  (index map + structural-zero mask); the cell conv output is bit-equivalent
  (up to float summation order) to the logical conv.
- a stride-1 kernel-3 logical conv cannot keep both output parities inside
  one cell column; the standard fix is a HALF-CELL PHASE SHIFT: the first
  conv of a pair writes rows {2q-1, 2q} (phi=1, one extra cell, two artifact
  rows to mask), the second consumes that and lands back on phi=0. Stages
  therefore need an even number of stride-1 convs (nnU-Net uses 2).
- strided (s=2) logical convs become stride-1 kernel-2 cell convs (entering
  a normal stage) or stride-2 kernel-3 phase-up cell convs (entering another
  s2d stage); kernel==stride transposed convs become one pointwise GEMM plus
  cheap interleave reshapes (see cell_transpose).

Reference correspondence: this module has no counterpart in
/root/reference — it is the TPU-native execution strategy for the stacked
conv blocks of dynamic_network_architectures' PlainConvUNet (consumed by
nnUNet/nnunetv2/utilities/get_network_from_plans.py:15-92). Numerics match
the plain channels-first path (models/blocks.py) exactly up to summation
order, including XLA-SAME padding conventions for strided convs.
"""

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Rep = Tuple[Tuple[int, int], ...]  # per-axis (factor, phase)


def normal_rep(dim: int) -> Rep:
    return tuple((1, 0) for _ in range(dim))


def rep_of(factors: Sequence[int], phases: Sequence[int] = None) -> Rep:
    if phases is None:
        phases = [0] * len(factors)
    return tuple((int(f), int(p)) for f, p in zip(factors, phases))


def rep_F(rep: Rep) -> int:
    return int(np.prod([f for f, _ in rep]))


def phase_up(rep: Rep) -> Rep:
    """Flip phase 0->1 on every factored axis."""
    return tuple((f, 1 if (f > 1 and p == 0) else (0 if f > 1 else p))
                 for f, p in rep)


def phase_mode() -> str:
    """How stride-1 kernel-3 conv pairs traverse the cell domain
    (read per trace; A/B knob for the perf campaign):

    - "shift" (default): half-cell phase shift — conv 1 lands phase-up
      (one extra cell per factored axis, odd array dims, artifact rows to
      mask), conv 2 lands back on phase 0. K_cell = 2 per factored axis,
      75% weight density.
    - "zero": both convs stay phase-0 (the axis algebra solves with
      K_cell = 3 per factored axis at 50% density). 1.5x the raw MXU
      flops per factored axis, but every array keeps even, tile-aligned
      dims — no artifact masks, no odd-dim relayout copies around the
      convs, and the cell conv takes the (C>=128, 27-tap) shape XLA runs
      fastest. Whether the flops or the bytes win is an empirical,
      per-factors question — measure before flipping the default.
    """
    import os
    return os.environ.get("MVDSEG_S2D_PHASE", "shift")


# ---------------------------------------------------------------------------
# axis solver
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def solve_axis(k: int, s: int, pad_lo: int, f_in: int, phi_in: int,
               f_out: int, phi_out: int):
    """Solve the index algebra of one axis of a cell conv.

    Logical row of array index q, sub i:  row = f*(q - phi) + phi + i
    (phi also acts as the array offset: a phi=1 array's index 0 holds cells
    starting at logical row -1). Logical conv: in_row = s*out_row + tap -
    pad_lo, tap in [0, k).

    Returns (entries, cell_stride, p_min, p_max) where entries is a tuple of
    (i, j, p, tap) with p the input-array offset relative to
    cell_stride * out_index.
    """
    assert (s * f_out) % f_in == 0, (k, s, f_in, f_out)
    cs = (s * f_out) // f_in
    entries = []
    for i in range(f_out):
        for tap in range(k):
            # out index o: in_row = s*(f_out*(o-phi_out)+phi_out+i)+tap-pad_lo
            ps = set()
            ent = None
            for o in (7, 8):  # two sample positions: p must be o-independent
                out_row = f_out * (o - phi_out) + phi_out + i
                in_row = s * out_row + tap - pad_lo
                j = (in_row - phi_in) % f_in
                g = (in_row - phi_in - j) // f_in + phi_in
                p = g - cs * o
                ps.add((j, p))
                ent = (i, j, p, tap)
            assert len(ps) == 1, "shift-variance: bad (f,s) combination"
            entries.append(ent)
    p_min = min(e[2] for e in entries)
    p_max = max(e[2] for e in entries)
    return tuple(entries), cs, p_min, p_max


def _logical_out_len(L: int, k: int, s: int, pad_lo: int, pad_total: int):
    return (L + pad_total - k) // s + 1


def _xla_same_pads(L: int, k: int, s: int) -> Tuple[int, int]:
    """XLA/TF 'SAME' padding (lo = total//2, extra on the high side), the
    convention the plain ConvCF path uses."""
    out = -(-L // s)
    total = max((out - 1) * s + k - L, 0)
    return total // 2, total - total // 2


class CellConvSpec:
    """Precomputed (static) description of one cell conv: per-axis tables,
    the flattened tap index map and structural-zero mask for the weight
    scatter, paddings, and output array lengths."""

    def __init__(self, kernel: Sequence[int], strides: Sequence[int],
                 rep_in: Rep, rep_out: Rep, in_lens: Sequence[int],
                 pad_mode: str = "SAME"):
        dim = len(kernel)
        self.kernel = tuple(kernel)
        self.strides = tuple(strides)
        self.rep_in, self.rep_out = rep_in, rep_out
        self.F_in, self.F_out = rep_F(rep_in), rep_F(rep_out)
        axes = []
        self.cell_strides = []
        self.pads = []
        self.out_lens = []          # output ARRAY lengths
        self.logical_out_lens = []
        for a in range(dim):
            k, s = kernel[a], strides[a]
            (f_i, ph_i), (f_o, ph_o) = rep_in[a], rep_out[a]
            n_in = in_lens[a]                      # input array length
            L_in = f_i * (n_in - ph_i)             # logical length
            if pad_mode == "TORCH":
                # torch nn.Conv3d(padding=(k-1)//2) symmetric convention
                # (imported reference checkpoints — models/blocks.py::ConvCF);
                # identical to SAME for stride-1 odd kernels
                pad_lo, pad_total = (k - 1) // 2, 2 * ((k - 1) // 2)
            elif s == 1:
                pad_lo, pad_total = (k - 1) // 2, k - 1
            else:
                pad_lo, pad_hi = _xla_same_pads(L_in, k, s)
                pad_total = pad_lo + pad_hi
            L_out = _logical_out_len(L_in, k, s, pad_lo, pad_total)
            # phase-1 reps store L + 2 rows in f*n slots (one artifact row
            # each end — _artifact_mask_np), so L must divide f in BOTH
            # phases: an odd L with ph_o=1 would make the mask zero a real
            # data row and undercount n_real
            assert L_out % f_o == 0, (L_out, f_o, ph_o)
            n_out = L_out // f_o + ph_o
            entries, cs, p_min, p_max = solve_axis(
                k, s, pad_lo, f_i, ph_i, f_o, ph_o)
            lo = -p_min
            hi = cs * (n_out - 1) + p_max - (n_in - 1)
            assert lo >= 0 and hi >= 0, (lo, hi)
            axes.append(entries)
            self.cell_strides.append(cs)
            self.pads.append((lo, hi))
            self.out_lens.append(n_out)
            self.logical_out_lens.append(L_out)
        self.K_cell = tuple(max(e[2] for e in ax) - min(e[2] for e in ax) + 1
                            for ax in axes)
        # tap-index map + mask over (F_out, F_in, *K_cell)
        idx = np.zeros((self.F_out, self.F_in) + self.K_cell, np.int32)
        msk = np.zeros_like(idx, np.float32)
        f_outs = [f for f, _ in rep_out]
        f_ins = [f for f, _ in rep_in]
        p_mins = [min(e[2] for e in ax) for ax in axes]
        per_axis = []  # list of per-axis (i, j, p_rel, tap) lists
        for a in range(dim):
            per_axis.append([(i, j, p - p_mins[a], t)
                             for (i, j, p, t) in axes[a]])
        import itertools
        for combo in itertools.product(*per_axis):
            I = 0
            J = 0
            for a, (i, j, _, _) in enumerate(combo):
                I = I * f_outs[a] + i
                J = J * f_ins[a] + j
            P = tuple(c[2] for c in combo)
            T = 0
            for a, (_, _, _, t) in enumerate(combo):
                T = T * kernel[a] + t
            idx[(I, J) + P] = T
            msk[(I, J) + P] = 1.0
        # keep as numpy: the spec is lru-cached across traces, and jnp
        # constants created inside one jit trace would leak into the next
        self._idx = idx
        self._msk = msk

    def cell_kernel(self, w: jnp.ndarray) -> jnp.ndarray:
        """(Co, Ci, *k) logical -> (Co*F_out, Ci*F_in, *K_cell) cell weights."""
        co, ci = w.shape[:2]
        wf = w.reshape(co, ci, -1)
        wc = wf[:, :, self._idx] * jnp.asarray(self._msk, w.dtype)
        # (co, ci, F_out, F_in, *K) -> (co, F_out, ci, F_in, *K)
        wc = jnp.moveaxis(wc, 2, 1)
        return wc.reshape(co * self.F_out, ci * self.F_in, *self.K_cell)

    def __call__(self, x: jnp.ndarray, w: jnp.ndarray,
                 b: jnp.ndarray = None, layout: str = "NC",
                 layout_in: str = None,
                 layout_out: str = None) -> jnp.ndarray:
        """Apply the cell conv. w, b are logical.

        layout "NC": x is (B, Ci*F_in, *cells_in) — channels-first cells.
        layout "NL": x is (B, *cells_in, Ci*F_in) — channels-last cells,
        the TPU convolution's native layout (feature dim on the 128-wide
        lane axis; C*F >= 128 by construction so nothing pads). Numerics
        are identical; only the conv's dimension_numbers change.
        layout_in/layout_out override the two sides independently (stage
        entry/exit convs change domain and layout in the same op)."""
        dim = len(self.kernel)
        li = layout_in or layout
        lo = layout_out or layout
        wc = self.cell_kernel(w).astype(x.dtype)
        letters = "DHW"[3 - dim:]
        lhs = f"NC{letters}" if li == "NC" else f"N{letters}C"
        out = f"NC{letters}" if lo == "NC" else f"N{letters}C"
        y = jax.lax.conv_general_dilated(
            x, wc, tuple(self.cell_strides), list(self.pads),
            dimension_numbers=(lhs, f"OI{letters}", out))
        if b is not None:
            bc = jnp.repeat(b, self.F_out).astype(y.dtype)
            shape = (1, -1) + (1,) * dim if lo == "NC" \
                else (1,) * (dim + 1) + (-1,)
            y = y + bc.reshape(shape)
        return y


# ---------------------------------------------------------------------------
# layout transforms, masks, norm
# ---------------------------------------------------------------------------

def space_to_depth(x: jnp.ndarray, factors: Sequence[int]) -> jnp.ndarray:
    """(B, C, *sp) -> (B, C*F, *sp/f), channel = c*F + row-major sub-index."""
    B, C = x.shape[:2]
    sp = x.shape[2:]
    dim = len(sp)
    shape = [B, C]
    for L, f in zip(sp, factors):
        assert L % f == 0, (L, f)
        shape += [L // f, f]
    x = x.reshape(shape)
    # (B, C, n1, f1, n2, f2, ...) -> (B, C, f1, f2, ..., n1, n2, ...)
    perm = [0, 1] + [2 + 2 * a + 1 for a in range(dim)] \
        + [2 + 2 * a for a in range(dim)]
    x = x.transpose(perm)
    F = int(np.prod(factors))
    return x.reshape(B, C * F, *[L // f for L, f in zip(sp, factors)])


def space_to_depth_cl(x: jnp.ndarray, factors: Sequence[int]) -> jnp.ndarray:
    """(B, C, *sp) -> (B, *sp/f, C*F) channels-LAST cells, lane = c*F +
    row-major sub-index — the NL-layout twin of space_to_depth, used so
    stage-0 entry convs can run the fused Pallas path directly (NL in/out,
    models/blocks.py::pallas_cell_eligible)."""
    B, C = x.shape[:2]
    sp = x.shape[2:]
    dim = len(sp)
    shape = [B, C]
    for L, f in zip(sp, factors):
        assert L % f == 0, (L, f)
        shape += [L // f, f]
    x = x.reshape(shape)
    # (B, C, n1, f1, n2, f2, ...) -> (B, n1, n2, ..., C, f1, f2, ...)
    perm = [0] + [2 + 2 * a for a in range(dim)] + [1] \
        + [2 + 2 * a + 1 for a in range(dim)]
    x = x.transpose(perm)
    F = int(np.prod(factors))
    return x.reshape(B, *[L // f for L, f in zip(sp, factors)], C * F)


def depth_to_space(x: jnp.ndarray, factors: Sequence[int]) -> jnp.ndarray:
    B, CF = x.shape[:2]
    cells = x.shape[2:]
    dim = len(cells)
    F = int(np.prod(factors))
    C = CF // F
    x = x.reshape(B, C, *factors, *cells)
    perm = [0, 1]
    for a in range(dim):
        perm += [2 + dim + a, 2 + a]
    x = x.transpose(perm)
    return x.reshape(B, C, *[n * f for n, f in zip(cells, factors)])


def depth_to_space_cl(x: jnp.ndarray, factors: Sequence[int]) -> jnp.ndarray:
    """Channels-last cells → channels-last spatial:
    (B, *cells, C*F) -> (B, *spatial, C)."""
    B = x.shape[0]
    cells = x.shape[1:-1]
    CF = x.shape[-1]
    dim = len(cells)
    F = int(np.prod(factors))
    C = CF // F
    x = x.reshape(B, *cells, C, *factors)
    perm = [0]
    for a in range(dim):
        perm += [1 + a, 1 + dim + 1 + a]  # n_a, f_a interleave
    perm += [1 + dim]                     # C last
    x = x.transpose(perm)
    return x.reshape(B, *[n * f for n, f in zip(cells, factors)], C)


@functools.lru_cache(maxsize=None)
def _artifact_mask_np(rep: Rep, arr_lens: Tuple[int, ...]):
    """(F, *cells) float mask zeroing rows outside the logical range, plus
    the real-voxel count. Only phi=1 axes have artifacts."""
    dim = len(rep)
    per_axis = []
    for (f, ph), n in zip(rep, arr_lens):
        m = np.ones((f, n), np.float32)
        if f > 1 and ph:
            m[0, 0] = 0.0        # logical row -1
            m[f - 1, n - 1] = 0.0  # logical row L
        per_axis.append(m)
    full = np.ones([f for f, _ in rep] + list(arr_lens), np.float32)
    for a, m in enumerate(per_axis):
        shape = [1] * (2 * dim)
        shape[a] = rep[a][0]
        shape[dim + a] = arr_lens[a]
        full = full * m.reshape(shape)
    F = rep_F(rep)
    n_real = int(full.sum()) * 1
    return full.reshape((F,) + tuple(arr_lens)), n_real


def artifact_mask(rep: Rep, arr_lens: Sequence[int]):
    m, n_real = _artifact_mask_np(tuple(rep), tuple(arr_lens))
    return jnp.asarray(m), n_real


def masked_instance_norm_act(x: jnp.ndarray, rep: Rep, scale, bias,
                             act: bool = True,
                             layout: str = "NC") -> jnp.ndarray:
    """Instance norm + leaky relu in the s2d domain: statistics per LOGICAL
    channel (reduced over the F sub-channels and all cells), artifact rows
    excluded (they are zeroed and the count corrected). Matches
    blocks.instance_norm_act_cf numerics on the logical tensor.

    layout "NC": x (B, C*F, *cells).  layout "NL": x (B, *cells, C*F).

    Default execution is the autodiff formulation below ("xla" — the
    measured winner on the v5e bench step, see models/blocks._norm_impl);
    set MVDSEG_NORM_IMPL=vjp for the custom-VJP form (ops/norm_vjp.py;
    same forward numerics, hand-written backward that keeps f32 off HBM —
    fewer bytes but slower end-to-end on this chip)."""
    import os
    impl = os.environ.get("MVDSEG_NORM_IMPL", "xla")
    if impl == "vjp":
        from .norm_vjp import instance_norm_act
        return instance_norm_act(x, rep=tuple(rep), layout=layout,
                                 scale=scale, bias=bias, act=act)
    if impl == "dot":
        return _instance_norm_act_dot(x, rep, scale, bias, act=act,
                                      layout=layout)
    nl = layout == "NL"
    B = x.shape[0]
    CF = x.shape[-1] if nl else x.shape[1]
    cells = x.shape[1:-1] if nl else x.shape[2:]
    F = rep_F(rep)
    C = CF // F
    needs_mask = any(f > 1 and p for f, p in rep)
    if nl:
        xg = x.reshape(B, *cells, C, F).astype(jnp.float32)
        red = tuple(range(1, 1 + len(cells))) + (xg.ndim - 1,)
    else:
        xg = x.reshape(B, C, F, *cells).astype(jnp.float32)
        red = tuple(range(2, xg.ndim))
    # Stats as two fused reductions + one ``y = x*a + b`` elementwise pass
    # with per-(B, C) coefficients: the (x - mean)*rsqrt(var) form makes
    # XLA materialize full-size f32 broadcasts of the keepdims stats
    # between the reduce and elementwise passes (measured with
    # batch_running/hlo_bytes.py); a/b are tiny, so the elementwise pass
    # reads bf16 x once and writes bf16 y once.
    if needs_mask:
        msk, n_real = artifact_mask(rep, cells)
        if nl:
            msk = jnp.moveaxis(msk, 0, -1)[None, ..., None, :]
        xg = xg * msk
        mean = xg.sum(axis=red) / n_real
        var = jnp.square(xg).sum(axis=red) / n_real - jnp.square(mean)
    else:
        mean = xg.mean(axis=red)                       # (B, C)
        var = jnp.square(xg).mean(axis=red) - jnp.square(mean)
    a = jax.lax.rsqrt(var + 1e-5)
    b = -mean * a
    if scale is not None:
        s = scale.astype(jnp.float32)[None, :]
        a, b = a * s, b * s
    if bias is not None:
        b = b + bias.astype(jnp.float32)[None, :]
    # broadcast (B, C) coefficients to the grouped layout's stat shape
    bshape = [1] * xg.ndim
    bshape[0] = B
    bshape[xg.ndim - 2 if nl else 1] = C
    a, b = a.reshape(bshape), b.reshape(bshape)
    from ..models.blocks import _norm_elemwise
    if _norm_elemwise() == "bf16" and x.dtype == jnp.bfloat16:
        # bf16 elementwise pass (see blocks._norm_elemwise): keeps the f32
        # view of x out of the apply, so XLA never materializes full-size
        # f32 copies of the full-res activations; ≤1 ulp vs the f32 form
        # since y is cast to bf16 on return regardless.
        xb = x.reshape(xg.shape)
        y = xb * a.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)
        if act:
            y = jax.nn.leaky_relu(y, negative_slope=0.01)
        if needs_mask:
            y = y * msk.astype(jnp.bfloat16)
        return y.reshape((B, *cells, CF) if nl else (B, CF, *cells))
    y = xg * a + b
    if act:
        y = jax.nn.leaky_relu(y, negative_slope=0.01)
    if needs_mask:
        y = y * msk  # re-zero artifact rows (affine/act made them nonzero)
    out_shape = (B, *cells, CF) if nl else (B, CF, *cells)
    return y.reshape(out_shape).astype(x.dtype)


def norm_coefs_from_stats(s1, s2, rep: Rep, scale, bias, cells):
    """Per-LANE instance-norm apply coefficients from the fused kernel's
    moment sums: y_norm = a*y + b with (a, b) each (B, C*F) f32 — the
    tiny differentiable statistics graph shared by the jnp apply
    (apply_norm_act_from_stats) and the normalize-on-load kernels
    (ops/pallas_cell.py::cell_conv_norm_stats)."""
    B, CF = s1.shape
    F = rep_F(rep)
    C = CF // F
    if any(f > 1 and p for f, p in rep):
        _, n_real = artifact_mask(rep, cells)
    else:
        n_real = float(np.prod(cells)) * F
    S1 = s1.reshape(B, C, F).sum(-1)
    S2 = s2.reshape(B, C, F).sum(-1)
    mean = S1 / n_real
    var = S2 / n_real - jnp.square(mean)
    a = jax.lax.rsqrt(var + 1e-5)
    b = -mean * a
    if scale is not None:
        s = scale.astype(jnp.float32)[None, :]
        a, b = a * s, b * s
    if bias is not None:
        b = b + bias.astype(jnp.float32)[None, :]
    # lane = c*F + f
    return jnp.repeat(a, F, axis=1), jnp.repeat(b, F, axis=1)


def apply_norm_act_from_stats(y_raw: jnp.ndarray, s1: jnp.ndarray,
                              s2: jnp.ndarray, rep: Rep, scale, bias,
                              act: bool = True, geom=None) -> jnp.ndarray:
    """Instance-norm apply + leaky relu given precomputed per-lane f32
    moment sums (s1 = Σy, s2 = Σy² over the masked cells, (B, C*F)) — the
    fused-kernel path (ops/pallas_cell.py) emits these from the conv pass,
    so no reduction re-reads the tensor here. NL layout only
    (y_raw: (B, *cells, C*F) with artifact rows already zeroed).

    ``geom`` = (o_off, out_lens): y_raw is stored PRE-PADDED (logical
    region of ``out_lens`` cells at physical ``o_off``, zero border —
    ops/pallas_cell.py out_pads); the apply re-zeroes everything outside
    the logical region so the result keeps the padded geometry the next
    conv reads directly.

    The apply runs in bf16 with pre-cast coefficients (see
    models/blocks._norm_elemwise — y is bf16 on return regardless), and
    the tiny (B, C) statistics graph stays in autodiff-land so the norm's
    stats coupling back-propagates through s1/s2 into the kernel's VJP."""
    B = y_raw.shape[0]
    phys = y_raw.shape[1:-1]
    CF = y_raw.shape[-1]
    F = rep_F(rep)
    C = CF // F
    cells = phys if geom is None else tuple(geom[1])
    needs_mask = any(f > 1 and p for f, p in rep)
    a, b = norm_coefs_from_stats(s1, s2, rep, scale, bias, cells)
    A = a.reshape(B, *(1,) * len(phys), CF)
    Bc = b.reshape(B, *(1,) * len(phys), CF)
    y = y_raw * A.astype(y_raw.dtype) + Bc.astype(y_raw.dtype)
    if act:
        y = jax.nn.leaky_relu(y, negative_slope=0.01)
    if geom is not None:
        # bounds + artifact mask in the padded geometry (iota-built, no
        # full-size constant)
        from . import pallas_cell as _pc
        m = _pc._out_mask(tuple(geom[1]), tuple(rep), CF, y.dtype,
                          o_off=tuple(geom[0]), phys=tuple(phys))
        return y * m
    if needs_mask:
        # re-zero artifact rows (the affine/act made them b-valued)
        msk, _ = artifact_mask(rep, cells)
        msk = jnp.moveaxis(msk, 0, -1)[None, ..., None, :]  # NL broadcast
        grouped = y.reshape(B, *cells, C, F)
        y = (grouped * msk.astype(y.dtype)).reshape(B, *cells, CF)
    return y


def _instance_norm_act_dot(x: jnp.ndarray, rep: Rep, scale, bias,
                           act: bool = True, layout: str = "NC"):
    """Instance norm + leaky relu with NO full-size f32 materialization
    (MVDSEG_NORM_IMPL=dot). The "xla" form's ``x.astype(f32)`` feeds three
    consumers (Σx, Σx², apply), so XLA CSEs and MATERIALIZES the f32
    upcast as full-size transposed copies — the largest copy rows of the
    round-3 HLO byte attribution (batch_running/hlo_bytes.py: 1.1 GB
    ``copy f32[32,64,16,33,128]`` per block). Here the stats are
    f32-ACCUMULATING reductions over the bf16 array (Σx² as a batched
    self-dot with preferred_element_type=f32 — bf16×bf16 products are
    exact in f32), and the apply pass has the per-element upcast as its
    only consumer, so everything fuses: 3 bf16 reads + 1 bf16 write per
    norm, zero f32 arrays. Numerics match the "xla" form to
    reduction-order tolerance."""
    nl = layout == "NL"
    B = x.shape[0]
    CF = x.shape[-1] if nl else x.shape[1]
    cells = x.shape[1:-1] if nl else x.shape[2:]
    F = rep_F(rep)
    C = CF // F
    needs_mask = any(f > 1 and p for f, p in rep)
    if nl:
        xb = x.reshape(B, *cells, C, F)
        red = tuple(range(1, 1 + len(cells))) + (xb.ndim - 1,)
    else:
        xb = x.reshape(B, C, F, *cells)
        red = tuple(range(2, xb.ndim))
    msk = None
    if needs_mask:
        msk, n_real = artifact_mask(rep, cells)
        if nl:
            msk = jnp.moveaxis(msk, 0, -1)[None, ..., None, :]
        xb = xb * msk.astype(xb.dtype)
        n = n_real
    else:
        n = float(np.prod([xb.shape[a] for a in red]))
    # (B, C, K) bf16 view; K collapses the minor dims only, so the reshape
    # is layout-preserving in NC (and a single relayout in NL)
    if nl:
        xf = jnp.moveaxis(xb, -2, 1).reshape(B, C, -1)  # (B, C, cells*F)
    else:
        xf = xb.reshape(B, C, -1)
    s1 = jnp.sum(xf, axis=-1, dtype=jnp.float32)              # (B, C)
    s2 = jax.lax.dot_general(
        xf, xf, (((2,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)                   # (B, C)
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    a = jax.lax.rsqrt(var + 1e-5)
    b = -mean * a
    if scale is not None:
        s = scale.astype(jnp.float32)[None, :]
        a, b = a * s, b * s
    if bias is not None:
        b = b + bias.astype(jnp.float32)[None, :]
    bshape = [1] * xb.ndim
    bshape[0] = B
    bshape[xb.ndim - 2 if nl else 1] = C
    a, b = a.reshape(bshape), b.reshape(bshape)
    y = xb.astype(jnp.float32) * a + b
    if act:
        y = jax.nn.leaky_relu(y, negative_slope=0.01)
    if needs_mask:
        y = y * msk  # re-zero artifact rows (affine/act made them nonzero)
    out_shape = (B, *cells, CF) if nl else (B, CF, *cells)
    return y.reshape(out_shape).astype(x.dtype)




# ---------------------------------------------------------------------------
# transposed conv (kernel == stride) as a dilated cell conv
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def solve_axis_transpose(s: int, f_in: int, f_out: int):
    """Axis table for a kernel==stride transposed conv between phase-0 reps.

    Matches lax.conv_transpose(..., 'SAME') semantics (the plain
    ConvTransposeCF path): logical out row r = W[s-1 - r%s] * x[r//s].
    Expressed as a cell conv with lhs_dilation: the input array is dilated
    by `dil`, and out[o] = sum_p Wc[..., p] x_dilated[o + p - lo]. Entries
    whose dilated position misses a real cell vanish automatically, which is
    what makes the per-parity routing shift-invariant.

    Returns (entries, dil, p_min, p_max); entries are (i, j, p, tap) with
    p relative to out index o and tap indexing the logical kernel axis.
    """
    assert (s * f_in) % f_out == 0
    dil = (s * f_in) // f_out
    entries = set()
    for o in range(8, 8 + 2 * s * f_in * f_out):
        for i in range(f_out):
            r = f_out * o + i
            m, kappa = divmod(r, s)
            tap = s - 1 - kappa
            j = m % f_in
            g = m // f_in
            p = dil * g - o  # dilated input position relative to out index
            entries.add((i, j, p, tap))
    # verify shift-invariance: the entry set must repeat with period 1 in o
    # (it does by construction of the loop range; trust + numeric tests)
    p_min = min(e[2] for e in entries)
    p_max = max(e[2] for e in entries)
    return tuple(sorted(entries)), dil, p_min, p_max


class CellTransposeSpec:
    """kernel==stride transposed conv between phase-0 reps, lowered to ONE
    conv_general_dilated with lhs_dilation (rank never exceeds the data's).
    Structural zeros cost extra MXU flops (up to 2x per folded axis) but the
    op stays a single dense C>=128 convolution."""

    def __init__(self, strides: Sequence[int], rep_in: Rep, rep_out: Rep):
        dim = len(strides)
        self.strides = tuple(strides)
        self.rep_in, self.rep_out = rep_in, rep_out
        self.F_in, self.F_out = rep_F(rep_in), rep_F(rep_out)
        axes, self.dils, self.p_mins = [], [], []
        for a in range(dim):
            (f_i, ph_i), (f_o, ph_o) = rep_in[a], rep_out[a]
            assert ph_i == 0 and ph_o == 0
            entries, dil, p_min, p_max = solve_axis_transpose(
                strides[a], f_i, f_o)
            axes.append(entries)
            self.dils.append(dil)
            self.p_mins.append(p_min)
        self.K_cell = tuple(max(e[2] for e in ax) - min(e[2] for e in ax) + 1
                            for ax in axes)
        idx = np.zeros((self.F_out, self.F_in) + self.K_cell, np.int32)
        msk = np.zeros_like(idx, np.float32)
        f_outs = [f for f, _ in rep_out]
        f_ins = [f for f, _ in rep_in]
        per_axis = [[(i, j, p - self.p_mins[a], t) for (i, j, p, t) in ax]
                    for a, ax in enumerate(axes)]
        import itertools
        for combo in itertools.product(*per_axis):
            I = J = T = 0
            for a, (i, j, _, t) in enumerate(combo):
                I = I * f_outs[a] + i
                J = J * f_ins[a] + j
                T = T * self.strides[a] + t
            P = tuple(c[2] for c in combo)
            idx[(I, J) + P] = T
            msk[(I, J) + P] = 1.0
        self._idx = idx
        self._msk = msk

    def __call__(self, x: jnp.ndarray, w: jnp.ndarray,
                 layout_in: str = "NC",
                 layout_out: str = "NC") -> jnp.ndarray:
        """x: (B, Ci*F_in, *cells) for layout_in 'NC', (B, *cells, Ci*F_in)
        for 'NL'; w logical (Ci, Co, *strides)."""
        dim = len(self.strides)
        ci = (x.shape[1] if layout_in == "NC" else x.shape[-1]) // self.F_in
        co = w.shape[1]
        # logical (Ci, Co, *k) -> (Co, Ci, K_flat) -> cell kernel
        wf = jnp.swapaxes(w, 0, 1).reshape(co, ci, -1)
        wc = wf[:, :, self._idx] * jnp.asarray(self._msk, w.dtype)
        wc = jnp.moveaxis(wc, 2, 1).reshape(
            co * self.F_out, ci * self.F_in, *self.K_cell)
        # out length per axis: out_cells = in_cells * s * f_in / f_out
        pads = []
        for a in range(dim):
            n_in = x.shape[2 + a] if layout_in == "NC" else x.shape[1 + a]
            n_out = n_in * self.strides[a] * self.rep_in[a][0] \
                // self.rep_out[a][0]
            dil_len = self.dils[a] * (n_in - 1) + 1
            lo = -self.p_mins[a]
            hi = (n_out - 1) + self.K_cell[a] - lo - dil_len
            assert hi >= -0 and lo >= 0, (lo, hi)
            pads.append((lo, hi))
        letters = "DHW"[3 - dim:]
        lhs = f"NC{letters}" if layout_in == "NC" else f"N{letters}C"
        out = f"NC{letters}" if layout_out == "NC" else f"N{letters}C"
        return jax.lax.conv_general_dilated(
            x, wc.astype(x.dtype), (1,) * dim, pads,
            lhs_dilation=tuple(self.dils),
            dimension_numbers=(lhs, f"OI{letters}", out))


@functools.lru_cache(maxsize=None)
def _transpose_spec(strides, rep_in, rep_out):
    return CellTransposeSpec(strides, rep_in, rep_out)


def cell_transpose(x: jnp.ndarray, w: jnp.ndarray, rep_in: Rep,
                   rep_out: Rep, strides: Sequence[int],
                   layout_in: str = "NC",
                   layout_out: str = "NC") -> jnp.ndarray:
    """Transposed conv with kernel==stride from rep_in to rep_out (both
    phase 0), matching ConvTransposeCF (lax.conv_transpose SAME) numerics.
    w: logical (Ci, Co, *k) with k == strides."""
    spec = _transpose_spec(tuple(strides), tuple(rep_in), tuple(rep_out))
    return spec(x, w, layout_in=layout_in, layout_out=layout_out)
