"""SelfAttnNet / FinalNet family (dual-modality CNN nets with bottleneck
attention decoders).

Parity: reference nnunetv2/training/my_network/selfattnNet.py (1234 LoC):
- SelfAttnNetv1-4 (:464-737): single shared PlainConvEncoder on both
  channels + a UNetDecoder variant with bottleneck self-attention.
- FinalNetv1-4 (:739-1160): per-modality PlainConvEncoders; v1 decodes with
  the distance-map decoder (UNetDecoder5), v2/v3 fuse via bottleneck
  cross/self attention (UNetDecoder3/2), v4 runs two independent attention
  decoders (UNetDecoder6 semantics) and averages the two outputs at
  inference (:1147-1160).
- Fusion_layer (:1166): 3-input sigmoid-gated conv fusion.

All variants are thin flax configs over PlainConvEncoder (models/unet.py)
and AttnUNetDecoderBase (models/attn_decoders.py) — the reference's six
near-identical decoder copies collapse into that one parameterized module.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attn_decoders import AttnUNetDecoderBase, UNetDecoder5Wrapper
from .unet import PlainConvEncoder


class _DualEncoderNet(nn.Module):
    """Shared scaffolding: encode channel 0 / channel 1 separately."""
    features_per_stage: Sequence[int]
    n_conv_per_stage: Sequence[int]
    kernel_sizes: Sequence[Sequence[int]]
    strides: Sequence[Sequence[int]]
    num_classes: int
    do_ds: bool = True
    hidden_size: int = 256
    dtype: jnp.dtype = jnp.bfloat16
    padding: str = "SAME"   # "TORCH" for reference-checkpoint import parity

    def _encoder(self, name):
        return PlainConvEncoder(self.features_per_stage,
                                self.n_conv_per_stage, self.kernel_sizes,
                                self.strides, dtype=self.dtype,
                                padding=self.padding, name=name)

    def _decoder(self, name, **kw):
        return AttnUNetDecoderBase(
            features_per_stage=self.features_per_stage,
            n_conv_per_stage=[2] * (len(self.features_per_stage) - 1),
            kernel_sizes=self.kernel_sizes, strides=self.strides,
            num_classes=self.num_classes, deep_supervision=self.do_ds,
            hidden_size=self.hidden_size, dtype=self.dtype, name=name, **kw)


class SelfAttnNetv1(_DualEncoderNet):
    """Single encoder on both channels + self-attention bottleneck decoder
    (reference :464-530)."""

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        skips = self._encoder("encoder")(x, train=train)
        return self._decoder("decoder", bottleneck="self")(skips, train=train)


# v2-v4 in the reference vary dropout/pos-embed details of the same design
SelfAttnNetv2 = SelfAttnNetv1
SelfAttnNetv3 = SelfAttnNetv1
SelfAttnNetv4 = SelfAttnNetv1


class FinalNetv1(_DualEncoderNet):
    """Dual encoders + cross-attention decoder returning (seg, distance map)
    (reference :739-836, decoder = UNetDecoder5)."""

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        skips1 = self._encoder("encoder1")(x[..., 0:1], train=train)
        skips2 = self._encoder("encoder2")(x[..., 1:2], train=train)
        dec = self._decoder("decoder", bottleneck="cross", dual_skips=True)
        return UNetDecoder5Wrapper(dec, name="decoder5")(skips1, skips2,
                                                         train=train)


class FinalNetv2(_DualEncoderNet):
    """Dual encoders + cross-attention fusion decoder (reference :838-954,
    decoder = UNetDecoder3)."""

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        skips1 = self._encoder("encoder1")(x[..., 0:1], train=train)
        skips2 = self._encoder("encoder2")(x[..., 1:2], train=train)
        return self._decoder("decoder", bottleneck="cross",
                             dual_skips=True)(skips1, skips2, train=train)


class FinalNetv3(_DualEncoderNet):
    """Dual encoders + per-branch self-attention fusion (reference :956-1076,
    decoder = UNetDecoder2)."""

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        skips1 = self._encoder("encoder1")(x[..., 0:1], train=train)
        skips2 = self._encoder("encoder2")(x[..., 1:2], train=train)
        return self._decoder("decoder", bottleneck="dual_self",
                             dual_skips=True)(skips1, skips2, train=train)


class FinalNetv4(_DualEncoderNet):
    """Dual encoders + two independent self-attention decoders; averages the
    branch outputs at inference (reference :1078-1160)."""

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        skips1 = self._encoder("encoder1")(x[..., 0:1], train=train)
        skips2 = self._encoder("encoder2")(x[..., 1:2], train=train)
        out1 = self._decoder("decoder1", bottleneck="self")(skips1,
                                                            train=train)
        out2 = self._decoder("decoder2", bottleneck="self")(skips2,
                                                            train=train)
        if not self.do_ds:
            return (out1 + out2) / 2
        return out1, out2


class Fusion_layer(nn.Module):
    """3-input sigmoid-gated conv fusion (reference selfattnNet.py:1166-1232
    / HybridNetwork.py:1839)."""
    in_chans: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x1, x2, x3, *, train: bool = True):
        dim = x1.ndim - 2

        def conv_bn_relu(x, features, k, name):
            x = nn.Conv(features, (k,) * dim, padding="SAME", use_bias=False,
                        dtype=self.dtype, name=name + "_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=jnp.float32, name=name + "_bn")(x)
            return nn.relu(x).astype(self.dtype)

        w = jax.nn.sigmoid(
            conv_bn_relu(jnp.concatenate([x2, x3], -1), self.in_chans, 3,
                         "gate").astype(jnp.float32))
        f2 = x2.astype(jnp.float32) * w
        f3 = x3.astype(jnp.float32) * w
        fused = conv_bn_relu((f2 + f3).astype(self.dtype), self.in_chans, 3,
                             "mix")
        out = conv_bn_relu(
            jnp.concatenate([fused, x2.astype(fused.dtype),
                             x3.astype(fused.dtype)], -1),
            self.in_chans, 3, "merge")
        return conv_bn_relu(jnp.concatenate([x1.astype(out.dtype), out], -1),
                            self.in_chans, 3, "out")

