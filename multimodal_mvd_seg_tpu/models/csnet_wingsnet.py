"""CSNet3D and WingsNet baselines.

Parity: the reference imports these from the missing modules
``nnunetv2.training.my_network.CSNet`` / ``.WingsNet``
(utilities/get_network_from_plans.py:9-10) and builds them via
``get_CSNet_from_plans`` (:244, ``CSNet3D(classes, channels)``) and
``get_wingsnet_from_plans`` (:254, ``WingsNet(in_channel, n_classes)``).
Reconstructed from the published architectures:

- CSNet3D (Mou et al., "CS²-Net: Deep learning segmentation of curvilinear
  structures"): 3D U-Net with a self-attention *spatial attention* block and
  a gram-matrix *channel attention* block at the bottleneck.
- WingsNet (Zheng et al., "Alleviating Class-wise Gradient Imbalance for
  Pulmonary Airway Segmentation"): encoder-decoder where EVERY stage emits a
  supervision "wing" (two groups of deep supervision heads).

Channels-last flax; attention matmuls fp32 on the MXU.
"""

from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import ConvNormAct, StackedConvBlocks


class SpatialAttentionBlock3D(nn.Module):
    """Affinity self-attention over (reduced) q/k with residual γ-scale."""
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        spatial = x.shape[1:-1]
        C = x.shape[-1]
        q = nn.Conv(max(C // 8, 1), (1,) * len(spatial), dtype=self.dtype,
                    name="query")(x).reshape(B, -1, max(C // 8, 1))
        k = nn.Conv(max(C // 8, 1), (1,) * len(spatial), dtype=self.dtype,
                    name="key")(x).reshape(B, -1, max(C // 8, 1))
        v = nn.Conv(C, (1,) * len(spatial), dtype=self.dtype,
                    name="value")(x).reshape(B, -1, C)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q.astype(jnp.float32),
                       k.astype(jnp.float32)), -1)
        out = jnp.einsum("bnm,bmc->bnc", attn, v.astype(jnp.float32))
        gamma = self.param("gamma", nn.initializers.zeros, (), jnp.float32)
        return (gamma * out.reshape(x.shape) + x.astype(jnp.float32)
                ).astype(self.dtype)


class ChannelAttentionBlock3D(nn.Module):
    """Gram-matrix channel attention with residual γ-scale."""
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        C = x.shape[-1]
        flat = x.reshape(B, -1, C).astype(jnp.float32)
        gram = jnp.einsum("bnc,bnd->bcd", flat, flat)
        attn = jax.nn.softmax(jnp.max(gram, -1, keepdims=True) - gram, -1)
        out = jnp.einsum("bcd,bnd->bnc", attn, flat)
        gamma = self.param("gamma", nn.initializers.zeros, (), jnp.float32)
        return (gamma * out.reshape(x.shape) + x.astype(jnp.float32)
                ).astype(self.dtype)


class CSNet3D(nn.Module):
    """classes, channels signature per the reference factory (:244-253)."""
    classes: int
    channels: int
    base_features: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        f = self.base_features
        dim = x.ndim - 2
        k = (3,) * dim
        feats = [f, f * 2, f * 4, f * 8]
        skips = []
        for i, ff in enumerate(feats):
            stride = (1,) * dim if i == 0 else (2,) * dim
            x = StackedConvBlocks(2, ff, k, stride, dtype=self.dtype,
                                  name=f"enc{i}")(x, train=train)
            skips.append(x)
        x = StackedConvBlocks(2, f * 16, k, (2,) * dim, dtype=self.dtype,
                              name="bottleneck")(x, train=train)
        x = SpatialAttentionBlock3D(f * 16, dtype=self.dtype,
                                    name="spatial_attn")(x)
        x = ChannelAttentionBlock3D(dtype=self.dtype, name="channel_attn")(x)
        for i in range(len(feats) - 1, -1, -1):
            x = nn.ConvTranspose(feats[i], (2,) * dim, strides=(2,) * dim,
                                 dtype=self.dtype, name=f"up{i}")(x)
            x = jnp.concatenate([x, skips[i].astype(x.dtype)], -1)
            x = StackedConvBlocks(2, feats[i], k, (1,) * dim,
                                  dtype=self.dtype,
                                  name=f"dec{i}")(x, train=train)
        return nn.Conv(self.classes, (1,) * dim, dtype=jnp.float32,
                       name="head")(x.astype(jnp.float32))


class WingsNet(nn.Module):
    """in_channel, n_classes signature per the reference factory
    (:254-262). Every encoder/decoder stage emits a 'wing' supervision head
    whose outputs are grouped into two supervision groups."""
    in_channel: int
    n_classes: int
    base_features: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        f = self.base_features
        dim = x.ndim - 2
        k = (3,) * dim
        feats = [f, f * 2, f * 4, f * 8]
        full_shape = x.shape[1:-1]
        wings1: List[jnp.ndarray] = []
        wings2: List[jnp.ndarray] = []

        def wing(x, group, name):
            w = nn.Conv(self.n_classes, (1,) * dim, dtype=jnp.float32,
                        name=name)(x.astype(jnp.float32))
            # upsample wing to full resolution (linear)
            if w.shape[1:-1] != full_shape:
                w = jax.image.resize(w, (w.shape[0], *full_shape,
                                         w.shape[-1]), "linear")
            (wings1 if group == 1 else wings2).append(w)

        skips = []
        for i, ff in enumerate(feats):
            stride = (1,) * dim if i == 0 else (2,) * dim
            x = StackedConvBlocks(2, ff, k, stride, dtype=self.dtype,
                                  name=f"enc{i}")(x, train=train)
            wing(x, 1, f"wing_enc{i}")
            skips.append(x)
        for i in range(len(feats) - 2, -1, -1):
            x = nn.ConvTranspose(feats[i], (2,) * dim, strides=(2,) * dim,
                                 dtype=self.dtype, name=f"up{i}")(x)
            x = jnp.concatenate([x, skips[i].astype(x.dtype)], -1)
            x = StackedConvBlocks(2, feats[i], k, (1,) * dim,
                                  dtype=self.dtype,
                                  name=f"dec{i}")(x, train=train)
            wing(x, 2, f"wing_dec{i}")
        out1 = sum(wings1) / len(wings1)
        out2 = sum(wings2) / len(wings2)
        return out1, out2
