"""Plain-conv and residual-encoder U-Nets, configured from plans.

TPU-native equivalents of the reference's external
dynamic_network_architectures PlainConvUNet / ResidualEncoderUNet (consumed via
utilities/get_network_from_plans.py:15-92). Channels-last; deep supervision
returns a list of logits coarsest→finest reversed to match nnU-Net order
(finest first)."""

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .blocks import (ConvCF, ConvTransposeCF, StackedConvBlocks,
                     StackedConvBlocksCF, StackedResBlocks)


class PlainConvEncoder(nn.Module):
    features_per_stage: Sequence[int]
    n_conv_per_stage: Sequence[int]
    kernel_sizes: Sequence[Sequence[int]]
    strides: Sequence[Sequence[int]]
    norm: str = "instance"
    dtype: jnp.dtype = jnp.bfloat16
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
                          name=f"stage{s}")(x, train=train)
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

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dim = x.ndim - 2
        x = jnp.moveaxis(x, -1, 1)  # → (B, C, *spatial)
        skips = []
        for s, (f, n, k, st) in enumerate(zip(self.features_per_stage,
                                              self.n_conv_per_stage_encoder,
                                              self.kernel_sizes,
                                              self.strides)):
            cls = nn.remat(StackedConvBlocksCF) if s < self.remat_stages \
                else StackedConvBlocksCF
            x = cls(n, f, k, st, dtype=self.dtype,
                    name=f"encoder_stage{s}")(x, train=train)
            skips.append(x)
        n_stages = len(self.features_per_stage)
        x = skips[-1]
        seg_outputs = []
        for d in range(n_stages - 1):
            skip_stage = n_stages - 2 - d
            f = self.features_per_stage[skip_stage]
            stride = tuple(self.strides[skip_stage + 1])
            x = ConvTransposeCF(f, stride, stride, dtype=self.dtype,
                                name=f"up{d}")(x)
            x = jnp.concatenate([x, skips[skip_stage].astype(x.dtype)],
                                axis=1)
            cls = nn.remat(StackedConvBlocksCF) \
                if skip_stage < self.remat_stages else StackedConvBlocksCF
            x = cls(self.n_conv_per_stage_decoder[d], f,
                    self.kernel_sizes[skip_stage],
                    (1,) * dim, dtype=self.dtype,
                    name=f"dec{d}")(x, train=train)
            if self.deep_supervision or d == n_stages - 2:
                seg = ConvCF(self.num_classes, (1,) * dim, (1,) * dim,
                             dtype=jnp.float32, name=f"seg{d}")(
                    x.astype(jnp.float32))
                seg_outputs.append(jnp.moveaxis(seg, 1, -1))
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
