"""Plain-conv and residual-encoder U-Nets, configured from plans.

TPU-native equivalents of the reference's external
dynamic_network_architectures PlainConvUNet / ResidualEncoderUNet (consumed via
utilities/get_network_from_plans.py:15-92). Channels-last; deep supervision
returns a list of logits coarsest→finest reversed to match nnU-Net order
(finest first)."""

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .blocks import (CellConv, ConvCF, ConvTransposeCF, ConvTransposeS2D,
                     StackedConvBlocks, StackedConvBlocksCF,
                     StackedConvBlocksS2D, StackedResBlocks)
from ..ops import s2d as _s2d


def s2d_stage_factors(patch_size, kernel_sizes, strides,
                      n_conv_per_stage_encoder, n_conv_per_stage_decoder,
                      s2d_stages, base_factors):
    """Per-stage space-to-depth factors for PlainConvUNetCF, demoting stages
    that don't satisfy the cell-conv constraints (see ops/s2d.py). Returns a
    list of per-stage factor tuples; s2d stages form a contiguous prefix."""
    n_stages = len(kernel_sizes)
    dim = len(patch_size)
    out = [(1,) * dim] * n_stages
    dims = list(patch_size)
    n_dec = list(n_conv_per_stage_decoder)
    for s in range(min(s2d_stages, n_stages - 1)):
        if s > 0:
            if any(d % st for d, st in zip(dims, strides[s])):
                break
            dims = [d // st for d, st in zip(dims, strides[s])]
        f = tuple(base_factors)
        ok = all(k == 3 or fa == 1 for k, fa in zip(kernel_sizes[s], f))
        ok &= all(k in (1, 3) for k in kernel_sizes[s])
        ok &= all(d % (2 * fa) == 0 for d, fa in zip(dims, f) if fa > 1)
        ok &= all(st in (1, 2) for st in strides[s])
        # the stride leaving the s2d prefix must be 2 on factored axes
        ok &= all(st == 2 for st, fa in zip(strides[s + 1], f) if fa > 1)
        ok &= n_conv_per_stage_encoder[s] % 2 == 0
        dec_idx = n_stages - 2 - s
        ok &= 0 <= dec_idx < len(n_dec) and n_dec[dec_idx] % 2 == 0
        if not ok:
            break
        out[s] = f
    return out


class PlainConvEncoder(nn.Module):
    features_per_stage: Sequence[int]
    n_conv_per_stage: Sequence[int]
    kernel_sizes: Sequence[Sequence[int]]
    strides: Sequence[Sequence[int]]
    norm: str = "instance"
    dtype: jnp.dtype = jnp.bfloat16
    padding: str = "SAME"   # "TORCH" for reference-checkpoint import parity
    # remat: trade FLOPs for HBM. True/"all" checkpoints every stage;
    # "auto" only the large early stages (cheap to recompute relative to
    # their activation footprint); False stores everything.
    remat: object = False
    remat_auto_stages: int = 3

    def _remat_stage(self, s: int) -> bool:
        if self.remat in (True, "all"):
            return True
        if self.remat == "auto":
            return s < self.remat_auto_stages
        return False

    @nn.compact
    def __call__(self, x, *, train: bool = True) -> List[jnp.ndarray]:
        skips = []
        for s, (f, n, k, st) in enumerate(zip(self.features_per_stage,
                                              self.n_conv_per_stage,
                                              self.kernel_sizes, self.strides)):
            block_cls = nn.remat(StackedConvBlocks) if self._remat_stage(s) \
                else StackedConvBlocks
            x = block_cls(n, f, k, st, norm=self.norm, dtype=self.dtype,
                          padding=self.padding, name=f"stage{s}")(x,
                                                                  train=train)
            skips.append(x)
        return skips


class ResidualEncoder(nn.Module):
    features_per_stage: Sequence[int]
    n_blocks_per_stage: Sequence[int]
    kernel_sizes: Sequence[Sequence[int]]
    strides: Sequence[Sequence[int]]
    norm: str = "instance"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = True) -> List[jnp.ndarray]:
        skips = []
        for s, (f, n, k, st) in enumerate(zip(self.features_per_stage,
                                              self.n_blocks_per_stage,
                                              self.kernel_sizes, self.strides)):
            x = StackedResBlocks(n, f, k, st, norm=self.norm, dtype=self.dtype,
                                 name=f"stage{s}")(x, train=train)
            skips.append(x)
        return skips


class UNetDecoder(nn.Module):
    """Transposed-conv upsampling + skip concat + conv stack + per-scale seg
    heads (deep supervision)."""
    features_per_stage: Sequence[int]     # encoder features, len n_stages
    n_conv_per_stage: Sequence[int]       # len n_stages - 1
    kernel_sizes: Sequence[Sequence[int]]
    strides: Sequence[Sequence[int]]      # encoder strides, len n_stages
    num_classes: int
    deep_supervision: bool = True
    norm: str = "instance"
    dtype: jnp.dtype = jnp.bfloat16
    return_last_feature: bool = False
    remat: object = False
    remat_auto_stages: int = 3

    def _remat_stage(self, skip_stage: int) -> bool:
        if self.remat in (True, "all"):
            return True
        if self.remat == "auto":
            return skip_stage < self.remat_auto_stages
        return False

    @nn.compact
    def __call__(self, skips: List[jnp.ndarray], *, train: bool = True):
        n_stages = len(self.features_per_stage)
        x = skips[-1]
        seg_outputs = []
        last_feature = None
        for d in range(n_stages - 1):
            skip_stage = n_stages - 2 - d
            f = self.features_per_stage[skip_stage]
            stride = tuple(self.strides[skip_stage + 1])
            x = nn.ConvTranspose(f, kernel_size=stride, strides=stride,
                                 use_bias=True, dtype=self.dtype,
                                 name=f"up{d}")(x)
            x = jnp.concatenate([x, skips[skip_stage].astype(x.dtype)], axis=-1)
            block_cls = nn.remat(StackedConvBlocks) \
                if self._remat_stage(skip_stage) else StackedConvBlocks
            x = block_cls(self.n_conv_per_stage[d], f,
                          self.kernel_sizes[skip_stage], (1,) * len(stride),
                          norm=self.norm, dtype=self.dtype,
                          name=f"dec{d}")(x, train=train)
            last_feature = x
            if self.deep_supervision or d == n_stages - 2:
                seg = nn.Conv(self.num_classes, kernel_size=(1,) * len(stride),
                              dtype=jnp.float32, name=f"seg{d}")(
                    x.astype(jnp.float32))
                seg_outputs.append(seg)
        # nnU-Net orders deep-supervision outputs finest-first
        seg_outputs = seg_outputs[::-1]
        if not self.deep_supervision:
            out = seg_outputs[0]
        else:
            out = seg_outputs
        if self.return_last_feature:
            return out, last_feature
        return out


class PlainConvUNet(nn.Module):
    """Reference network for 2d/3d_fullres/3d_lowres configurations."""
    features_per_stage: Sequence[int]
    n_conv_per_stage_encoder: Sequence[int]
    n_conv_per_stage_decoder: Sequence[int]
    kernel_sizes: Sequence[Sequence[int]]
    strides: Sequence[Sequence[int]]
    num_classes: int
    deep_supervision: bool = True
    norm: str = "instance"
    dtype: jnp.dtype = jnp.bfloat16
    remat: object = False

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        skips = PlainConvEncoder(self.features_per_stage,
                                 self.n_conv_per_stage_encoder,
                                 self.kernel_sizes, self.strides,
                                 norm=self.norm, dtype=self.dtype,
                                 remat=self.remat,
                                 name="encoder")(x, train=train)
        return UNetDecoder(self.features_per_stage, self.n_conv_per_stage_decoder,
                           self.kernel_sizes, self.strides, self.num_classes,
                           deep_supervision=self.deep_supervision, norm=self.norm,
                           dtype=self.dtype, remat=self.remat,
                           name="decoder")(skips, train=train)


class PlainConvUNetCF(nn.Module):
    """Channels-first fast path of PlainConvUNet for TPU.

    Takes/returns channels-last tensors at the boundary (one transpose each
    way) but keeps every internal activation (B, C, *spatial): for the
    small-channel early stages this avoids the bf16 lane padding that makes
    channels-last 3D U-Nets HBM-bound on TPU (1.42 → 2.09 steps/s on the
    benchmark shape, and activations fit HBM without rematerialization).
    Parameter-compatible in structure (same stages/field names modulo
    layout) with PlainConvUNet.
    """
    features_per_stage: Sequence[int]
    n_conv_per_stage_encoder: Sequence[int]
    n_conv_per_stage_decoder: Sequence[int]
    kernel_sizes: Sequence[Sequence[int]]
    strides: Sequence[Sequence[int]]
    num_classes: int
    deep_supervision: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    # checkpoint the first N (largest) stages' conv blocks; their recompute
    # is cheap relative to the HBM they free
    remat_stages: int = 0
    # run the first N stages in the space-to-depth domain (ops/s2d.py):
    # small-channel full-res convs become C>=128 cell convs that the MXU
    # runs 2-4x faster. Purely an execution-layout choice — parameter trees
    # and outputs are identical (up to float summation order) to s2d_stages=0.
    # Stages that fail the cell-conv constraints are demoted automatically.
    s2d_stages: int = 0
    s2d_factors: Tuple[int, ...] = (1, 2, 2)
    # cell layout of the s2d stages: "NC" = (B, C*F, *cells), "NL" =
    # (B, *cells, C*F) — the TPU conv's native layout (C*F >= 128 pads
    # nothing); entry/exit convs change layout inside the conv op
    s2d_layout: str = "NC"
    # logits dtype; bf16 matches the reference's AMP training (losses
    # upcast to f32 before softmax/Dice)
    seg_dtype: jnp.dtype = jnp.bfloat16
    # "SAME" (default) or "TORCH": strided-conv padding convention (see
    # ConvCF). "TORCH" exists for importing reference-trained checkpoints
    # (model_sharing/torch_import.py); the s2d cell solver handles both
    # conventions (CellConvSpec pad_mode), so imported nets keep the fast
    # path.
    conv_padding: str = "SAME"
    # reference transpconvs carry a bias (ConvTransposeCF.use_bias)
    transpconv_bias: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dim = x.ndim - 2
        x = jnp.moveaxis(x, -1, 1)  # → (B, C, *spatial)
        sf = s2d_stage_factors(
            x.shape[2:], self.kernel_sizes, self.strides,
            self.n_conv_per_stage_encoder, self.n_conv_per_stage_decoder,
            self.s2d_stages, self.s2d_factors) if self.s2d_stages else \
            [(1,) * dim] * len(self.features_per_stage)

        def factored(s):
            return any(f > 1 for f in sf[s])

        def lay(s):
            return "NL" if factored(s) and self.s2d_layout == "NL" else "NC"

        if factored(0):
            # NL stage 0 takes channels-last cells directly so the entry
            # conv runs the fused Pallas path (pallas_cell_eligible)
            x = _s2d.space_to_depth_cl(x, sf[0]) if lay(0) == "NL" \
                else _s2d.space_to_depth(x, sf[0])
        skips = []
        for s, (f, n, k, st) in enumerate(zip(self.features_per_stage,
                                              self.n_conv_per_stage_encoder,
                                              self.kernel_sizes,
                                              self.strides)):
            in_f = sf[0] if s == 0 else sf[s - 1]
            use_s2d = factored(s) or any(ff > 1 for ff in in_f)
            base = StackedConvBlocksS2D if use_s2d else StackedConvBlocksCF
            cls = nn.remat(base) if s < self.remat_stages else base
            kwargs = dict(dtype=self.dtype, name=f"encoder_stage{s}")
            if use_s2d:
                li = lay(0) if s == 0 else lay(s - 1)
                x = cls(n, f, k, st, tuple(in_f), tuple(sf[s]),
                        layout=lay(s), layout_in=li,
                        padding=self.conv_padding,
                        input_no_grad=(s == 0),
                        **kwargs)(x, train=train)
            else:
                x = cls(n, f, k, st, padding=self.conv_padding,
                        **kwargs)(x, train=train)
            skips.append(x)
        n_stages = len(self.features_per_stage)
        x = skips[-1]
        seg_outputs = []
        for d in range(n_stages - 1):
            skip_stage = n_stages - 2 - d
            f = self.features_per_stage[skip_stage]
            stride = tuple(self.strides[skip_stage + 1])
            src_f, dst_f = sf[skip_stage + 1], sf[skip_stage]
            if factored(skip_stage) or any(ff > 1 for ff in src_f):
                x = ConvTransposeS2D(f, stride, stride, tuple(src_f),
                                     tuple(dst_f), dtype=self.dtype,
                                     layout_in=lay(skip_stage + 1),
                                     layout_out=lay(skip_stage),
                                     use_bias=self.transpconv_bias,
                                     name=f"up{d}")(x)
            else:
                x = ConvTransposeCF(f, stride, stride, dtype=self.dtype,
                                    use_bias=self.transpconv_bias,
                                    name=f"up{d}")(x)
            use_s2d = factored(skip_stage)
            base = StackedConvBlocksS2D if use_s2d else StackedConvBlocksCF
            cls = nn.remat(base) if skip_stage < self.remat_stages else base
            kwargs = dict(dtype=self.dtype, name=f"dec{d}")
            if use_s2d:
                # concat-free skip fusion: the first conv runs split-weight
                # over (upsampled, skip) — saves materializing the >0.5 GB
                # concatenated tensor at the full-res stages (CellConv)
                x = cls(self.n_conv_per_stage_decoder[d], f,
                        self.kernel_sizes[skip_stage], (1,) * dim,
                        tuple(dst_f), tuple(dst_f), layout=lay(skip_stage),
                        layout_in=lay(skip_stage),
                        padding=self.conv_padding, **kwargs)(
                    (x, skips[skip_stage].astype(x.dtype)), train=train)
            else:
                x = jnp.concatenate([x, skips[skip_stage].astype(x.dtype)],
                                    axis=1)
                x = cls(self.n_conv_per_stage_decoder[d], f,
                        self.kernel_sizes[skip_stage], (1,) * dim,
                        padding=self.conv_padding, **kwargs)(x, train=train)
            if self.deep_supervision or d == n_stages - 2:
                # seg heads in seg_dtype (default bf16 — the reference
                # trains under AMP so its logits are half precision too;
                # the losses upcast to f32 before softmax). At the full-res
                # stage an f32 logits tensor costs 2x the HBM of the whole
                # bf16 feature map.
                sd = self.seg_dtype
                if use_s2d:
                    rep = _s2d.rep_of(dst_f)
                    ll = lay(skip_stage)
                    seg = CellConv(self.num_classes, (1,) * dim, (1,) * dim,
                                   rep, rep, dtype=sd, layout_in=ll,
                                   layout_out=ll,
                                   name=f"seg{d}")(x.astype(sd))
                    seg = _s2d.depth_to_space_cl(seg, dst_f) if ll == "NL" \
                        else jnp.moveaxis(_s2d.depth_to_space(seg, dst_f),
                                          1, -1)
                else:
                    seg = ConvCF(self.num_classes, (1,) * dim, (1,) * dim,
                                 dtype=sd, name=f"seg{d}")(x.astype(sd))
                    seg = jnp.moveaxis(seg, 1, -1)
                seg_outputs.append(seg)
        seg_outputs = seg_outputs[::-1]
        if not self.deep_supervision:
            return seg_outputs[0]
        return seg_outputs


class ResidualEncoderUNet(nn.Module):
    features_per_stage: Sequence[int]
    n_conv_per_stage_encoder: Sequence[int]
    n_conv_per_stage_decoder: Sequence[int]
    kernel_sizes: Sequence[Sequence[int]]
    strides: Sequence[Sequence[int]]
    num_classes: int
    deep_supervision: bool = True
    norm: str = "instance"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        skips = ResidualEncoder(self.features_per_stage,
                                self.n_conv_per_stage_encoder,
                                self.kernel_sizes, self.strides,
                                norm=self.norm, dtype=self.dtype,
                                name="encoder")(x, train=train)
        return UNetDecoder(self.features_per_stage, self.n_conv_per_stage_decoder,
                           self.kernel_sizes, self.strides, self.num_classes,
                           deep_supervision=self.deep_supervision, norm=self.norm,
                           dtype=self.dtype, name="decoder")(skips, train=train)
