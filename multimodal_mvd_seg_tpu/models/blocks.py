"""Conv building blocks (flax.linen).

TPU-native re-design of the dynamic_network_architectures building blocks the
reference uses (ConvDropoutNormReLU / StackedConvBlocks / residual blocks).

Two data layouts:
- ``channels_last`` (B, *spatial, C): flax default.
- ``channels_first`` (B, C, *spatial): the fast path on TPU for the early
  U-Net stages — bf16 tiles are (16 sublanes × 128 lanes) on the two minor
  dims, so channels-last tensors with C∈{16,32,64} waste 2–8× HBM in lane
  padding, while channels-first puts the large spatial dims minor
  (measured: 1.41 → 1.85 train steps/s on the 3d_fullres benchmark shape;
  the space-to-depth execution below then takes it to 4.19 — see
  ops/s2d.py and documentation/tpu_performance.md).
"""

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Shape = Union[int, Sequence[int]]


def _tup(x: Shape, dim: int) -> Tuple[int, ...]:
    return tuple(x) if isinstance(x, (tuple, list)) else (x,) * dim


class ConvCF(nn.Module):
    """channels-first convolution (NC*spatial, weights OI*k).

    ``padding``: "SAME" (XLA/TF convention — total (out−1)s+k−L, extra pad
    on the HIGH side) or "TORCH" (symmetric (k−1)//2 per side, the
    reference's nn.Conv3d(padding=k//2) convention). For stride-1 odd
    kernels the two coincide; for strided convs on even lengths they
    produce the same output length but windows shifted by one voxel —
    "TORCH" exists so reference-trained checkpoints can be imported with
    exact alignment (model_sharing/torch_import.py)."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x):
        dim = len(self.kernel_size)
        cin = x.shape[1]
        kshape = (self.features, cin, *self.kernel_size)
        fan_in = cin * int(np.prod(self.kernel_size))
        w = self.param("kernel", nn.initializers.variance_scaling(
            2.0, "fan_in", "truncated_normal"), kshape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32) if self.use_bias else None
        pad = "SAME" if self.padding == "SAME" else \
            [((k - 1) // 2, (k - 1) // 2) for k in self.kernel_size]
        letters = "DHW"[3 - dim:]
        dn = (f"NC{letters}", f"OI{letters}", f"NC{letters}")
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            tuple(self.strides), pad, dimension_numbers=dn)
        if self.use_bias:
            y = y + b.astype(y.dtype).reshape(1, -1, *([1] * dim))
        return y


class ConvTransposeCF(nn.Module):
    """channels-first transposed convolution (weights IO*k).

    ``use_bias`` defaults False (the round-1 parameter tree); the
    reference's transpconvs carry a bias (conv_bias=True in
    get_network_from_plans) — through the following instance norm it only
    matters at padded borders, but checkpoint import needs it exact."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    dtype: jnp.dtype = jnp.bfloat16
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        dim = len(self.kernel_size)
        cin = x.shape[1]
        kshape = (cin, self.features, *self.kernel_size)
        w = self.param("kernel", nn.initializers.variance_scaling(
            2.0, "fan_in", "truncated_normal"), kshape, jnp.float32)
        letters = "DHW"[3 - dim:]
        dn = (f"NC{letters}", f"IO{letters}", f"NC{letters}")
        y = jax.lax.conv_transpose(
            x.astype(self.dtype), w.astype(self.dtype), tuple(self.strides),
            "SAME", dimension_numbers=dn)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(y.dtype).reshape(1, -1, *([1] * dim))
        return y


def _norm_impl() -> str:
    """Which instance-norm implementation to trace (read per trace so the
    perf campaign can A/B without re-importing):

    - "xla" (default): the jnp two-reduction formulation below under
      jax.checkpoint. MEASURED WINNER on the v5e bench step: 4.62 vs 3.91
      steps/s against the custom-VJP form — XLA's remat schedule trades
      the extra canonical-layout copies for better fusion of the stats
      recompute into the backward convs, and on this chip the fusion wins.
    - "vjp": ops/norm_vjp.py — hand-written VJP; saves only the bf16 input
      + (B, C) stats, backward is two bf16-read fusions, no jax.checkpoint
      boundary. Predicted to win by the offline HLO byte attribution
      (fewer f32 relayout copies) but measured SLOWER end-to-end on chip;
      kept for A/B and for memory-constrained shapes (it halves norm
      residual memory).
    """
    import os
    return os.environ.get("MVDSEG_NORM_IMPL", "xla")


def _norm_elemwise() -> str:
    """Precision of the norm's elementwise pass in the "xla" impl:
    "f32" (historic default) computes ``y = x_f32*a + b`` in f32 and casts
    the result; "bf16" pre-casts the per-(B, C) coefficients and keeps the
    whole pass in bf16 — removes the full-size f32 materializations of x
    (which otherwise feeds 3 consumers) at ≤1 ulp output difference."""
    import os
    return os.environ.get("MVDSEG_NORM_ELEMWISE", "f32")


def _cell_impl() -> str:
    """Execution engine for the stride-1 s2d cell convs in NL layout:

    - "pallas": fused Pallas kernel (ops/pallas_cell.py) — conv + artifact
      mask + instance-norm moment sums in one pass, custom VJP with
      dgrad/wgrad kernels. Measured 73 vs 45 TF/s dense against the XLA
      cell conv standalone on the dec4 block1 shape.
    - "xla": lax.conv_general_dilated (the only option on CPU backends —
      Pallas TPU kernels do not run there).
    Default "auto": pallas on TPU backends, xla elsewhere.
    """
    import os
    mode = os.environ.get("MVDSEG_CELL_IMPL", "auto")
    if mode == "auto":
        import jax as _jax
        return "xla" if _jax.default_backend() == "cpu" else "pallas"
    return mode


def instance_norm_act_cf(x, act: bool = True,
                         scale=None, bias=None) -> jnp.ndarray:
    """Instance norm (+ leaky relu) over the spatial axes of (B, C, *sp),
    fp32 statistics, output in the input dtype.

    Default execution is the "xla" form below (measured fastest on chip;
    see _norm_impl). The custom-VJP alternative (ops/norm_vjp.py, numerics
    bit-identical forward, textbook gradient — pinned against autodiff in
    tests/test_norm_vjp.py) is kept for A/B and low-memory shapes. The
    xla form is written as two fused reductions (E[x], E[x^2]) + one
    elementwise pass
    ``y = x*a + b`` with per-(B,C) coefficients: the naive
    ``(x - mean) * rsqrt(var)`` form makes XLA materialize full-size f32
    broadcasts of the keepdims stats and an f32 copy of x between the
    reduce and elementwise passes — measured ~0.5 GB of pure relayout/
    broadcast HBM traffic per norm at the full-res stages (see
    batch_running/hlo_bytes.py). a/b are tiny (B, C) tensors, so the
    elementwise pass reads only bf16 x and writes bf16 y."""
    if _norm_impl() == "vjp":
        from ..ops.norm_vjp import instance_norm_act
        return instance_norm_act(x, scale=scale, bias=bias, act=act)
    axes = tuple(range(2, x.ndim))
    xf = x.astype(jnp.float32)
    m = xf.mean(axis=axes)                      # (B, C)
    m2 = jnp.square(xf).mean(axis=axes)
    v = m2 - jnp.square(m)  # fine here: IN activations are O(1)
    a = jax.lax.rsqrt(v + 1e-5)
    b = -m * a
    if scale is not None:
        s = scale.astype(jnp.float32)[None, :]  # (1, C)
        a, b = a * s, b * s
    if bias is not None:
        b = b + bias.astype(jnp.float32)[None, :]
    cshape = a.shape + (1,) * (x.ndim - 2)
    if _norm_elemwise() == "bf16" and x.dtype == jnp.bfloat16:
        # Elementwise pass entirely in bf16: the f32 form makes the f32
        # view of x feed THREE consumers (both stats reductions + the
        # y pass), and XLA materializes full-size f32 canonical-layout
        # copies of the full-res activations (~0.55 GB each, see
        # batch_running/hlo_bytes.py). With the coefficients pre-cast,
        # xf only feeds the reductions (convert fuses into them) and the
        # y pass reads/writes bf16 only. Numerics: y is cast to bf16 on
        # return regardless, so rounding (a, b) first changes the result
        # by at most one extra ulp — the same order as the existing
        # output rounding (pinned in tests/test_s2d.py).
        y = x * a.reshape(cshape).astype(jnp.bfloat16) \
            + b.reshape(cshape).astype(jnp.bfloat16)
        if act:
            y = jax.nn.leaky_relu(y, negative_slope=0.01)
        return y
    y = xf * a.reshape(cshape) + b.reshape(cshape)
    if act:
        y = jax.nn.leaky_relu(y, negative_slope=0.01)
    return y.astype(x.dtype)


class ConvNormActCF(nn.Module):
    """channels-first conv → instance norm (affine) → leaky relu.

    The norm+act is wrapped in jax.checkpoint: its backward would otherwise
    save BOTH the conv output and the normalized tensor (needed for the
    affine-scale gradient) — recomputing the elementwise normalization in
    the backward pass halves stored activations for near-zero FLOPs, which
    is what lets the full 3d_fullres step fit 16G HBM with no stage-level
    rematerialization."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    act: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = ConvCF(self.features, self.kernel_size, self.strides,
                   dtype=self.dtype, padding=self.padding, name="conv")(x)
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)

        if _norm_impl() == "vjp":
            # the custom VJP already saves only (x, stats) — no checkpoint
            # boundary needed (and none wanted: its canonical-layout copies
            # are what the VJP form removes).
            return instance_norm_act_cf(x, act=self.act, scale=scale,
                                        bias=bias)
        norm = jax.checkpoint(
            lambda t, s, b: instance_norm_act_cf(t, act=self.act, scale=s,
                                                 bias=b))
        return norm(x, scale, bias)


class StackedConvBlocksCF(nn.Module):
    n_convs: int
    features: int
    kernel_size: Sequence[int]
    first_stride: Sequence[int]
    dtype: jnp.dtype = jnp.bfloat16
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dim = len(self.kernel_size)
        for i in range(self.n_convs):
            stride = self.first_stride if i == 0 else (1,) * dim
            x = ConvNormActCF(self.features, self.kernel_size, stride,
                              dtype=self.dtype, padding=self.padding,
                              name=f"block{i}")(x, train=train)
        return x


class ConvNormAct(nn.Module):
    """conv → instance norm → leaky relu (negative_slope 0.01), the reference
    stack's default block (nnU-Net conv_op+InstanceNorm+LeakyReLU)."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    norm: str = "instance"          # instance | batch | none
    act: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    # "SAME" (XLA symmetric-ish pads) or "TORCH" ((k-1)//2 both sides —
    # identical for stride 1, torch-window-aligned for strided convs; used
    # by reference-checkpoint import, model_sharing/torch_import.py)
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        pad = "SAME" if self.padding == "SAME" else \
            tuple(((k - 1) // 2, (k - 1) // 2) for k in self.kernel_size)
        x = nn.Conv(self.features, kernel_size=tuple(self.kernel_size),
                    strides=tuple(self.strides), padding=pad,
                    use_bias=True, dtype=self.dtype, name="conv")(x)
        # fp32 norm output: measured FASTER than bf16 output on v5e (XLA
        # fuses the fp32 normalize+act+downcast into one pass; a bf16 norm
        # graph compiled to a slower schedule: 0.94 vs 1.42 steps/s on the
        # benchmark step)
        if self.norm == "instance":
            x = nn.InstanceNorm(epsilon=1e-5, dtype=jnp.float32,
                                name="norm")(x)
        elif self.norm == "batch":
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             dtype=jnp.float32, momentum=0.9, name="norm")(x)
        if self.act:
            x = nn.leaky_relu(x, negative_slope=0.01)
        return x.astype(self.dtype)


class StackedConvBlocks(nn.Module):
    """n convs; the first applies the stage stride (strided conv downsampling,
    nnU-Net style)."""
    n_convs: int
    features: int
    kernel_size: Sequence[int]
    first_stride: Sequence[int]
    norm: str = "instance"
    dtype: jnp.dtype = jnp.bfloat16
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dim = len(self.kernel_size)
        for i in range(self.n_convs):
            stride = self.first_stride if i == 0 else (1,) * dim
            x = ConvNormAct(self.features, self.kernel_size, stride,
                            norm=self.norm, dtype=self.dtype,
                            padding=self.padding,
                            name=f"block{i}")(x, train=train)
        return x


class BasicResBlock(nn.Module):
    """Residual block used by the ResidualEncoderUNet variant."""
    features: int
    kernel_size: Sequence[int]
    first_stride: Sequence[int]
    norm: str = "instance"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dim = len(self.kernel_size)
        y = ConvNormAct(self.features, self.kernel_size, self.first_stride,
                        norm=self.norm, dtype=self.dtype, name="conv1")(x, train=train)
        y = ConvNormAct(self.features, self.kernel_size, (1,) * dim,
                        norm=self.norm, act=False, dtype=self.dtype,
                        name="conv2")(y, train=train)
        needs_proj = (x.shape[-1] != self.features
                      or any(s != 1 for s in self.first_stride))
        if needs_proj:
            x = ConvNormAct(self.features, (1,) * dim, self.first_stride,
                            norm=self.norm, act=False, dtype=self.dtype,
                            name="proj")(x, train=train)
        return nn.leaky_relu(y + x, negative_slope=0.01).astype(self.dtype)


class StackedResBlocks(nn.Module):
    n_blocks: int
    features: int
    kernel_size: Sequence[int]
    first_stride: Sequence[int]
    norm: str = "instance"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dim = len(self.kernel_size)
        for i in range(self.n_blocks):
            stride = self.first_stride if i == 0 else (1,) * dim
            x = BasicResBlock(self.features, self.kernel_size, stride,
                              norm=self.norm, dtype=self.dtype,
                              name=f"block{i}")(x, train=train)
        return x


# ---------------------------------------------------------------------------
# space-to-depth (s2d) execution path — see ops/s2d.py for the math.
# Parameter trees are IDENTICAL to the plain channels-first modules above
# (logical weight shapes), so checkpoints are interchangeable and the s2d
# flag is purely an execution-layout choice.
# ---------------------------------------------------------------------------

import functools as _functools

from ..ops import s2d as _s2d


@_functools.lru_cache(maxsize=None)
def _cell_spec(kernel, strides, rep_in, rep_out, in_lens, pad_mode="SAME"):
    return _s2d.CellConvSpec(kernel, strides, rep_in, rep_out, in_lens,
                             pad_mode=pad_mode)


def pallas_cell_eligible_static(kernel_size, strides, rep_in, rep_out,
                                in_lens, cf_in, features,
                                padding="SAME") -> bool:
    """Shape-only variant of pallas_cell_eligible (no live arrays) — used
    by StackedConvBlocksS2D to plan conv-pair fusion before any tensor
    exists. ``cf_in`` is the input lane count — an int, or a tuple with
    one entry per channel-partition part (every part must pass, exactly
    like the dynamic check's per-part loop)."""
    if _cell_impl() != "pallas":
        return False
    if len(kernel_size) != 3:
        return False

    def lanes_ok(n):
        return n % 128 == 0 or (n in (8, 16, 32, 64))

    cfs = tuple(cf_in) if isinstance(cf_in, (tuple, list)) else (cf_in,)
    f_out = _s2d.rep_F(rep_out)
    if any(not lanes_ok(c) for c in cfs) or (features * f_out) % 128:
        return False
    spec = _cell_spec(tuple(map(int, kernel_size)),
                      tuple(map(int, strides)),
                      rep_in, rep_out, tuple(map(int, in_lens)), padding)
    return all(cs == 1 for cs in spec.cell_strides) \
        and spec.out_lens[2] >= 8


def pallas_cell_eligible(kernel_size, strides, rep_in, rep_out, parts,
                         layout_in, layout_out, features,
                         padding="SAME") -> bool:
    """Whether this cell conv can run the fused Pallas path
    (ops/pallas_cell.py): pallas enabled (TPU backend), NL layout both
    sides, 3D, stride-1 cell grid, MXU-compatible channel counts (128-lane
    multiples, or a small power-of-two CF_in for entry convs from the
    image — the K=8 contraction wastes MXU rows but those convs are
    bandwidth-bound, and the fused pass removes their relayout bytes),
    and a minor cell axis big enough for the 8-padded halo windows."""
    if _cell_impl() != "pallas":
        return False
    if not (layout_in == "NL" and layout_out == "NL"
            and len(kernel_size) == 3):
        return False

    def lanes_ok(n):
        return n % 128 == 0 or (n in (8, 16, 32, 64))

    f_out = _s2d.rep_F(rep_out)
    if (any(not lanes_ok(p.shape[-1]) for p in parts)
            or (features * f_out) % 128):
        return False
    in_lens = tuple(map(int, parts[0].shape[1:-1]))
    spec = _cell_spec(tuple(map(int, kernel_size)),
                      tuple(map(int, strides)),
                      rep_in, rep_out, in_lens, padding)
    return all(cs == 1 for cs in spec.cell_strides) \
        and spec.out_lens[2] >= 8


class CellConv(nn.Module):
    """Logical conv (params shaped like ConvCF's) executed in the s2d cell
    domain described by (rep_in, rep_out).

    ``x`` may be a TUPLE of channel-partition tensors (e.g. the decoder's
    upsampled features and the skip): the conv then runs once per part with
    the weight split along Ci and the results summed — numerically the conv
    of their concatenation (up to float summation order) WITHOUT ever
    materializing the concatenated tensor, which at the full-res stages
    costs a >0.5 GB HBM round trip per step."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    rep_in: tuple
    rep_out: tuple
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    # cell layouts (ops/s2d.py): "NC" = (B, C*F, *cells), "NL" =
    # (B, *cells, C*F); entry/exit convs may change layout in the conv op
    layout_in: str = "NC"
    layout_out: str = "NC"
    # strided-conv padding convention: "SAME" or "TORCH" (see ConvCF)
    padding: str = "SAME"
    # the input needs no cotangent (it is the non-trained image): the
    # Pallas VJP skips its dgrad conv entirely
    input_no_grad: bool = False

    @nn.compact
    def __call__(self, x, want_stats: bool = False, chained: dict = None,
                 out_pads=None, pre_in: dict = None):
        parts = x if isinstance(x, (tuple, list)) else (x,)
        dim = len(self.kernel_size)
        f_in = _s2d.rep_F(self.rep_in)
        caxis = 1 if self.layout_in == "NC" else -1
        cins = [p.shape[caxis] // f_in for p in parts]
        cin = sum(cins)
        kshape = (self.features, cin, *self.kernel_size)
        w = self.param("kernel", nn.initializers.variance_scaling(
            2.0, "fan_in", "truncated_normal"), kshape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32) if self.use_bias else None
        if chained is not None:
            # normalize-on-load (ops/pallas_cell.cell_conv_norm_stats):
            # x is the RAW pre-padded previous conv output, logical lens
            # from the chain info (the physical shape carries padding)
            in_lens = tuple(chained["in_lens"])
        elif pre_in is not None:
            # pre-padded ACTIVATED input (pad-mode fusion: the producer's
            # apply wrote the consumer's halo geometry directly)
            in_lens = tuple(pre_in["in_lens"])
        else:
            in_lens = parts[0].shape[2:] if self.layout_in == "NC" \
                else tuple(parts[0].shape[1:-1])
        spec = _cell_spec(tuple(map(int, self.kernel_size)),
                          tuple(map(int, self.strides)),
                          self.rep_in, self.rep_out, tuple(in_lens),
                          self.padding)
        if chained is not None:
            from ..ops import pallas_cell as _pc
            assert want_stats and len(parts) == 1
            wc = spec.cell_kernel(w.astype(self.dtype))
            wt = jnp.moveaxis(
                wc.reshape(*wc.shape[:2], -1), (0, 1, 2), (2, 1, 0))
            return _pc.cell_conv_norm_stats(
                parts[0].astype(self.dtype), chained["ab"], wt,
                tuple(spec.K_cell), tuple(spec.pads),
                tuple(spec.out_lens), tuple(spec.rep_out),
                tuple(chained["in_lens"]), tuple(chained["rep_in"]),
                tuple(chained["x_off"]), chained.get("slope", 0.01),
                out_pads)
        if want_stats:
            # fused Pallas path (ops/pallas_cell.py): conv + artifact mask
            # + per-lane instance-norm moment sums in one pass. The conv
            # BIAS is not applied: under the instance norm that always
            # follows (ConvNormActS2D) a per-channel constant cancels
            # exactly ((y+b - mean(y+b))/σ(y+b) == (y - mean(y))/σ(y)),
            # so skipping it is numerically identical and the bias param
            # correctly receives zero gradient.
            from ..ops import pallas_cell as _pc
            assert self.layout_in == "NL" and self.layout_out == "NL"
            assert all(cs == 1 for cs in spec.cell_strides)
            ws, xs = [], []
            off = 0
            for p, ci in zip(parts, cins):
                wp = jax.lax.slice_in_dim(w, off, off + ci, axis=1)
                off += ci
                wc = spec.cell_kernel(wp.astype(self.dtype))
                # (CoF, CiF, *K) -> (T, CiF, CoF)
                wt = jnp.moveaxis(
                    wc.reshape(*wc.shape[:2], -1), (0, 1, 2), (2, 1, 0))
                pt = p.astype(self.dtype)
                cf = pt.shape[-1]
                if cf % 128:
                    # Mosaic DMA slices need 128-aligned lanes: zero-pad
                    # the lane dim (and the matching weight rows — exact
                    # numerics; jnp.pad's VJP slices the grads back).
                    # Worth it only for entry convs whose input is small
                    # vs their output (pallas_cell_eligible gates this).
                    pad = 128 - cf % 128
                    pt = jnp.pad(pt, [(0, 0)] * (pt.ndim - 1) + [(0, pad)])
                    wt = jnp.pad(wt, [(0, 0), (0, pad), (0, 0)])
                ws.append(wt)
                xs.append(pt)
            return _pc.cell_conv_stats(
                tuple(xs), tuple(ws), tuple(spec.K_cell),
                tuple(spec.pads), tuple(spec.out_lens),
                tuple(spec.rep_out),
                ((tuple(pre_in["in_lens"]),) if pre_in is not None else
                 tuple(tuple(map(int, p.shape[1:-1])) for p in xs)),
                not self.input_no_grad, out_pads,
                tuple(pre_in["x_off"]) if pre_in is not None else None)
        out = None
        off = 0
        for p, ci in zip(parts, cins):
            wp = jax.lax.slice_in_dim(w, off, off + ci, axis=1)
            off += ci
            y = spec(p.astype(self.dtype), wp.astype(self.dtype), None,
                     layout_in=self.layout_in, layout_out=self.layout_out)
            out = y if out is None else out + y
        if b is not None:
            bc = jnp.repeat(b, spec.F_out).astype(out.dtype)
            shape = (1, -1) + (1,) * dim if self.layout_out == "NC" \
                else (1,) * (dim + 1) + (-1,)
            out = out + bc.reshape(shape)
        return out


class ConvNormActS2D(nn.Module):
    """cell conv → masked instance norm (count-corrected) → leaky relu.
    Param tree identical to ConvNormActCF."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    rep_in: tuple
    rep_out: tuple
    act: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    layout_in: str = "NC"
    layout_out: str = "NC"
    padding: str = "SAME"
    input_no_grad: bool = False

    def _pallas_ok(self, parts) -> bool:
        return pallas_cell_eligible(
            self.kernel_size, self.strides, self.rep_in, self.rep_out,
            parts, self.layout_in, self.layout_out,
            self.features, self.padding)

    @nn.compact
    def __call__(self, x, *, train: bool = True, raw_in: dict = None,
                 out_geom=None, out_apply: bool = False,
                 pre_in: dict = None):
        """``raw_in``: x is the previous conv's RAW pre-padded output and
        this conv normalizes it on load (dict ab/in_lens/rep_in/x_off/
        slope — ops/pallas_cell.cell_conv_norm_stats).
        ``out_geom`` = (o_off, phys): write the conv output pre-padded
        for the NEXT conv; with ``out_apply`` the norm apply runs here
        (in the padded geometry, border re-zeroed) and the ACTIVATED
        tensor returns — else the apply is deferred and (y_raw, ab)
        returns with the per-lane coefficients.
        ``pre_in``: x is a pre-padded ACTIVATED input (dict
        in_lens/x_off — the pad-mode counterpart of raw_in)."""
        parts = x if isinstance(x, (tuple, list)) else (x,)
        conv = CellConv(self.features, self.kernel_size, self.strides,
                        self.rep_in, self.rep_out, dtype=self.dtype,
                        layout_in=self.layout_in,
                        layout_out=self.layout_out,
                        padding=self.padding,
                        input_no_grad=self.input_no_grad, name="conv")
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        rep = self.rep_out
        lo = self.layout_out
        if raw_in is not None or pre_in is not None \
                or out_geom is not None or self._pallas_ok(parts):
            if raw_in is not None:
                y_raw, s1, s2 = conv(parts[0], want_stats=True,
                                     chained=raw_in, out_pads=out_geom)
            else:
                y_raw, s1, s2 = conv(x, want_stats=True,
                                     out_pads=out_geom, pre_in=pre_in)
            cells = self._out_cells(parts, raw_in or pre_in)
            if out_geom is not None and not out_apply:
                # defer the apply: hand (y_raw, ab) to the next conv
                a, b = _s2d.norm_coefs_from_stats(s1, s2, rep, scale,
                                                  bias, cells)
                return y_raw, jnp.stack([a, b], axis=1)
            return _s2d.apply_norm_act_from_stats(
                y_raw, s1, s2, rep, scale, bias, act=self.act,
                geom=((out_geom[0], cells)
                      if out_geom is not None else None))
        x = conv(x)
        if _norm_impl() == "vjp":
            return _s2d.masked_instance_norm_act(x, rep, scale, bias,
                                                 act=self.act, layout=lo)
        norm = jax.checkpoint(
            lambda t, s, b: _s2d.masked_instance_norm_act(
                t, rep, s, b, act=self.act, layout=lo))
        return norm(x, scale, bias)

    def _out_cells(self, parts, raw_in):
        in_lens = tuple(raw_in["in_lens"]) if raw_in is not None else \
            tuple(map(int, parts[0].shape[1:-1]))
        spec = _cell_spec(tuple(map(int, self.kernel_size)),
                          tuple(map(int, self.strides)),
                          self.rep_in, self.rep_out, in_lens,
                          self.padding)
        return tuple(spec.out_lens)


class StackedConvBlocksS2D(nn.Module):
    """n logical convs executed in the s2d domain.

    The stage's activations live at `factors` (phase 0); stride-1 convs
    alternate phase up/down, so `n_convs` must be even when any factor > 1.
    The first conv consumes `in_factors` (the previous stage's rep, phase 0)
    and applies `first_stride`. `factors` all-1 with factored `in_factors`
    expresses the exit conv back to the normal domain."""
    n_convs: int
    features: int
    kernel_size: Sequence[int]
    first_stride: Sequence[int]
    in_factors: Sequence[int]
    factors: Sequence[int]
    dtype: jnp.dtype = jnp.bfloat16
    # stage cell layout ("NC"/"NL") and the layout the input arrives in.
    # Unfactored reps (normal domain) are always carried NC: with C < 128
    # channels-last would re-introduce the lane padding s2d exists to avoid.
    layout: str = "NC"
    layout_in: str = "NC"
    # strided-conv padding convention ("SAME"/"TORCH", see ConvCF) — only
    # the stage entry conv can be strided, stride-1 convs are identical
    padding: str = "SAME"
    # first conv's input is the non-trained image: its Pallas VJP skips
    # the dgrad conv (set by the U-Net on encoder stage 0)
    input_no_grad: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dim = len(self.kernel_size)
        stage_rep = _s2d.rep_of(self.factors)
        in_rep = _s2d.rep_of(self.in_factors)
        factored = any(f > 1 for f in self.factors)
        zero_phase = _s2d.phase_mode() == "zero"
        if factored and not zero_phase:
            assert self.n_convs % 2 == 0, \
                "s2d stages need an even conv count"
        stage_layout = self.layout if factored else "NC"

        # static walk: per-conv geometry, then mark conv pairs (i, i+1)
        # where i's norm+act can fuse into i+1's tile loads (both on the
        # Pallas NL path, conv i single-output chainable) — the producer
        # then writes its raw output pre-padded for the consumer and the
        # activated tensor never exists in HBM (ops/pallas_cell.py).
        reps, strides_l, specs, in_lens_l = [], [], [], []
        rep = in_rep
        parts0 = x if isinstance(x, (tuple, list)) else (x,)
        cur_lens = tuple(map(int, parts0[0].shape[1:-1])) \
            if stage_layout == "NL" and self.layout_in == "NL" else None
        for i in range(self.n_convs):
            stride = self.first_stride if i == 0 else (1,) * dim
            if factored and not zero_phase:
                rep_out = _s2d.phase_up(stage_rep) if i % 2 == 0 \
                    else stage_rep
            else:
                rep_out = stage_rep  # normal domain (exit conv when i==0)
            spec = None
            in_lens_l.append(cur_lens)
            if cur_lens is not None:
                spec = _cell_spec(tuple(map(int, self.kernel_size)),
                                  tuple(map(int, stride)), rep, rep_out,
                                  cur_lens, self.padding)
                cur_lens = tuple(spec.out_lens)
            reps.append((rep, rep_out))
            strides_l.append(tuple(map(int, stride)))
            specs.append(spec)
            rep = rep_out

        def cf_of(r):
            return self.features * _s2d.rep_F(r)

        def cf_in_of(i):
            # conv 0's input is the previous stage's output (or a multi-
            # part decoder tuple) — its lane count is NOT features*rep_F
            # (the stage's own width). Use the live parts so the plan
            # agrees with the runtime pallas_cell_eligible per-part check;
            # convs i>0 consume conv i-1's output, whose cf is exact.
            if i == 0:
                return tuple(int(p.shape[-1]) for p in parts0)
            return cf_of(reps[i][0])

        import os
        # "chain": normalize-on-load (the apply runs inside the next
        # conv's kernels); "pad": the apply stays in XLA but writes the
        # next conv's halo geometry directly (pad passes still vanish);
        # "off" (default): no pair fusion. Round-5 on-chip A/B with
        # bench.py as arbiter (2 reps each, documentation/
        # tpu_performance.md): off 7.505/7.514, pad 7.506/7.522, chain
        # 7.495/7.488 steps/s — pair fusion does not beat the unfused
        # pallas path once the planner bug that forced ineligible fusions
        # was fixed, so per win-or-delete the modes are opt-in, not
        # default. MVDSEG_CELL_FUSE_PAIRS=0 is legacy off.
        fuse_mode = os.environ.get("MVDSEG_CELL_FUSE_MODE", "off")
        if os.environ.get("MVDSEG_CELL_FUSE_PAIRS", "1") != "1":
            fuse_mode = "off"
        fuse_into_next = [False] * self.n_convs
        for i in range(self.n_convs - 1):
            if fuse_mode == "off":
                break
            if i > 0 and fuse_into_next[i - 1]:
                continue   # disjoint pairs: a consumer never defers too
            si, sn = specs[i], specs[i + 1]
            if si is None or sn is None:
                continue
            ok_i = pallas_cell_eligible_static(
                self.kernel_size, strides_l[i], *reps[i],
                in_lens_l[i], cf_in_of(i), self.features,
                self.padding)
            ok_n = pallas_cell_eligible_static(
                self.kernel_size, strides_l[i + 1], *reps[i + 1],
                in_lens_l[i + 1], cf_in_of(i + 1),
                self.features, self.padding)
            fuse_into_next[i] = ok_i and ok_n

        from ..ops import pallas_cell as _pc
        carry = None   # (y_raw, ab) + geometry of a deferred norm apply
        li = self.layout_in
        for i in range(self.n_convs):
            rep, rep_out = reps[i]
            blk = ConvNormActS2D(self.features, self.kernel_size,
                                 strides_l[i], rep, rep_out,
                                 dtype=self.dtype,
                                 layout_in=li, layout_out=stage_layout,
                                 padding=self.padding,
                                 input_no_grad=(i == 0
                                                and self.input_no_grad),
                                 name=f"block{i}")
            out_geom = None
            if fuse_into_next[i]:
                sn = specs[i + 1]
                lo_c, need_c = _pc.consumer_pad_geometry(
                    tuple(sn.K_cell), tuple(sn.pads), tuple(sn.out_lens),
                    cf_of(reps[i + 1][0]), cf_of(reps[i + 1][1]), 1)
                out_geom = _pc.padded_out_geometry(
                    tuple(sn.K_cell), in_lens_l[i + 1], lo_c, need_c,
                    cf_of(reps[i + 1][1]), cf_of(reps[i + 1][0]),
                    align=fuse_mode == "chain")
            kw = {}
            if carry is not None:
                if "ab" in carry:
                    kw["raw_in"] = carry
                else:
                    kw["pre_in"] = carry
                x_in = carry.pop("y")
            else:
                x_in = x
            if out_geom is not None:
                kw["out_geom"] = out_geom
                kw["out_apply"] = fuse_mode == "pad"
            out = blk(x_in, train=train, **kw)
            if out_geom is not None:
                info = dict(in_lens=tuple(specs[i].out_lens),
                            x_off=tuple(out_geom[0]))
                if fuse_mode == "chain":
                    y_raw, ab = out
                    carry = dict(y=y_raw, ab=ab,
                                 rep_in=tuple(reps[i][1]), slope=0.01,
                                 **info)
                else:
                    carry = dict(y=out, **info)
            else:
                x = out
                carry = None
            li = stage_layout
        return x


class ConvTransposeS2D(nn.Module):
    """kernel==stride transposed conv between s2d reps (param tree identical
    to ConvTransposeCF)."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    in_factors: Sequence[int]
    out_factors: Sequence[int]
    dtype: jnp.dtype = jnp.bfloat16
    layout_in: str = "NC"
    layout_out: str = "NC"
    # imported reference checkpoints carry a transpconv bias (see
    # ConvTransposeCF); param tree stays identical to ConvTransposeCF
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        f_in = int(np.prod(self.in_factors))
        caxis = 1 if self.layout_in == "NC" else -1
        cin = x.shape[caxis] // f_in
        kshape = (cin, self.features, *self.kernel_size)
        w = self.param("kernel", nn.initializers.variance_scaling(
            2.0, "fan_in", "truncated_normal"), kshape, jnp.float32)
        y = _s2d.cell_transpose(
            x.astype(self.dtype), w.astype(self.dtype),
            _s2d.rep_of(self.in_factors), _s2d.rep_of(self.out_factors),
            tuple(self.strides), layout_in=self.layout_in,
            layout_out=self.layout_out)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            dim = len(self.kernel_size)
            f_out = int(np.prod(self.out_factors))
            bc = jnp.repeat(b, f_out).astype(y.dtype)
            shape = (1, -1) + (1,) * dim if self.layout_out == "NC" \
                else (1,) * (dim + 1) + (-1,)
            y = y + bc.reshape(shape)
        return y
