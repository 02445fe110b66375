"""U-Net decoders with bottleneck self-/cross-attention + attention blocks.

Parity: reference nnunetv2/training/my_network/UNetDecoder.py (1221 LoC):
six modified copies of dynamic-network-architectures' UNetDecoder plus the
attention primitives. The copies differ only in their bottleneck treatment
and skip fusion, so the TPU rebuild parameterizes ONE flax decoder and
exposes the six named variants:

- ``UNetDecoderAttn``  (ref UNetDecoder :13)   — single skip set, bottleneck
  self-attention (pos-embed + MHSA + conv refinement).
- ``UNetDecoder2``     (:152) — dual skips, per-branch bottleneck
  self-attention, 1×1 proj of the concat, stages concat both skip sets.
- ``UNetDecoder3``     (:306) — dual skips, bottleneck CROSS-attention
  exchanging the two modalities, otherwise like v2.
- ``UNetDecoder4``     (:465) — dual skips, per-stage merge-conv fusion of
  the two skip sets.
- ``UNetDecoder5``     (:632) — v3 + additionally returns the Euclidean
  distance-transform map of the hard segmentation (host callback; the
  reference uses scipy distance_transform_edt on CPU too).
- ``UNetDecoder6``     (:797) — plain single-skip decoder whose bottleneck
  input can be substituted (``attn_skip``).
- ``UNetDecoder_return_last_fea`` (:927) — v6 that also returns the last
  feature map.
- Attention (:1060), Cross_Attention (:1087), Self_Attention (:1129),
  CrossWindowAttention3D (:1157 — windowed cross-attention with relative
  position bias).

Channels-last; attention matmuls in fp32 accumulation on the MXU.
"""

from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .blocks import StackedConvBlocks

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


class Attention(nn.Module):
    """Plain MHSA over tokens (B, N, C) (reference UNetDecoder.py:1060)."""
    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.1
    proj_drop: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        B, N, C = x.shape
        h = self.num_heads
        qkv = nn.DenseGeneral((3, h, C // h), use_bias=self.qkv_bias,
                              name="qkv")(x).astype(jnp.float32)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (C // h) ** -0.5
        attn = jax.nn.softmax(attn, -1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


Self_Attention = Attention  # reference :1129 is the same computation


class Cross_Attention(nn.Module):
    """Bidirectional cross-attention between two token sets
    (reference :1087): q1·k2→v2 and q2·k1→v1."""
    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    attn_drop: float = 0.1
    proj_drop: float = 0.1

    @nn.compact
    def __call__(self, x1, x2, *, train: bool = True):
        B, N, C = x1.shape
        h = self.num_heads

        def qkv(x, name):
            t = nn.DenseGeneral((3, h, C // h), use_bias=self.qkv_bias,
                                name=name)(x).astype(jnp.float32)
            return tuple(t[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        q1, k1, v1 = qkv(x1, "qkv1")
        q2, k2, v2 = qkv(x2, "qkv2")
        scale = (C // h) ** -0.5

        def attend(q, k, v, pname):
            a = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, -1)
            a = nn.Dropout(self.attn_drop, deterministic=not train)(a)
            o = jnp.einsum("bhnm,bhmd->bhnd", a, v)
            o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
            o = nn.Dense(C, name=pname)(o)
            return nn.Dropout(self.proj_drop, deterministic=not train)(o)

        return attend(q1, k2, v2, "proj1"), attend(q2, k1, v1, "proj2")


class CrossWindowAttention3D(nn.Module):
    """Windowed cross-attention with learned relative position bias
    (reference :1157). x attends into y; both (B, N, C) with
    N = Wd·Wh·Ww tokens of one window."""
    dim: int
    window_size: Sequence[int]
    num_heads: int
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, y, mask=None, *, train: bool = True):
        B, N, C = x.shape
        h = self.num_heads
        wd, wh, ww = self.window_size
        table = self.param("relative_position_bias_table", _trunc02,
                           ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), h),
                           jnp.float32)
        coords = np.stack(np.meshgrid(np.arange(wd), np.arange(wh),
                                      np.arange(ww), indexing="ij"))
        flat = coords.reshape(3, -1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.transpose(1, 2, 0)
        rel[:, :, 0] += wd - 1
        rel[:, :, 1] += wh - 1
        rel[:, :, 2] += ww - 1
        rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
        rel[:, :, 1] *= (2 * ww - 1)
        index = jnp.asarray(rel.sum(-1))            # (Wd·Wh·Ww)²

        q = nn.Dense(C, use_bias=self.qkv_bias, name="query")(x)
        k = nn.Dense(C, use_bias=self.qkv_bias, name="key")(y)
        v = nn.Dense(C, use_bias=self.qkv_bias, name="value")(y)

        def heads(t):
            return t.reshape(B, N, h, C // h).transpose(0, 2, 1, 3)

        q, k, v = heads(q).astype(jnp.float32), heads(k).astype(jnp.float32), \
            heads(v).astype(jnp.float32)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (C // h) ** -0.5, k)
        bias = table[index[:N, :N].reshape(-1)].reshape(N, N, h)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            attn = attn + mask[None, None]
        attn = jax.nn.softmax(attn, -1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class _BottleneckSelfAttn(nn.Module):
    """pos-embed + MHSA + conv refinement on a volume bottleneck
    (the block shared by all decoder variants; reference :76-103)."""
    hidden_size: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        B = x.shape[0]
        spatial = x.shape[1:-1]
        C = x.shape[-1]
        N = int(np.prod(spatial))
        tokens = x.reshape(B, N, C)
        pe = self.param("pos_embed", nn.initializers.zeros, (1, N, C),
                        jnp.float32)
        tokens = tokens + pe.astype(tokens.dtype)
        normed = nn.LayerNorm(dtype=jnp.float32, name="norm1")(tokens)
        attn = tokens + Attention(C, name="attn")(
            normed.astype(tokens.dtype), train=train)
        vol = attn.reshape(B, *spatial, C)
        conv = nn.Conv(C, (3,) * len(spatial), padding="SAME",
                       dtype=self.dtype, name="conv1")(vol)
        conv = nn.Dropout(0.1, deterministic=not train)(conv)
        conv = nn.Conv(C, (1,) * len(spatial), dtype=self.dtype,
                       name="conv2")(conv)
        return (vol + conv).astype(self.dtype)


class _BottleneckCrossAttn(nn.Module):
    """Cross-attention bottleneck exchange for dual-modality decoders
    (reference UNetDecoder3/5 forward)."""
    hidden_size: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x1, x2, *, train: bool = True):
        B = x1.shape[0]
        spatial = x1.shape[1:-1]
        C = x1.shape[-1]
        N = int(np.prod(spatial))
        t1 = x1.reshape(B, N, C)
        t2 = x2.reshape(B, N, C)
        pe1 = self.param("pos_embed1", nn.initializers.zeros, (1, N, C),
                         jnp.float32)
        pe2 = self.param("pos_embed2", nn.initializers.zeros, (1, N, C),
                         jnp.float32)
        t1 = t1 + pe1.astype(t1.dtype)
        t2 = t2 + pe2.astype(t2.dtype)
        n1 = nn.LayerNorm(dtype=jnp.float32, name="norm1")(t1)
        n2 = nn.LayerNorm(dtype=jnp.float32, name="norm2")(t2)
        a1, a2 = Cross_Attention(C, name="crossattn")(
            n1.astype(t1.dtype), n2.astype(t2.dtype), train=train)
        t1, t2 = t1 + a1, t2 + a2
        outs = []
        for i, t in enumerate((t1, t2), 1):
            vol = t.reshape(B, *spatial, C)
            conv = nn.Conv(C, (3,) * len(spatial), padding="SAME",
                           dtype=self.dtype, name=f"conv{i}_1")(vol)
            conv = nn.Dropout(0.1, deterministic=not train)(conv)
            conv = nn.Conv(C, (1,) * len(spatial), dtype=self.dtype,
                           name=f"conv{i}_2")(conv)
            outs.append((vol + conv).astype(self.dtype))
        return outs[0], outs[1]


class AttnUNetDecoderBase(nn.Module):
    """The parameterized decoder behind the six reference variants."""
    features_per_stage: Sequence[int]
    n_conv_per_stage: Sequence[int]
    kernel_sizes: Sequence[Sequence[int]]
    strides: Sequence[Sequence[int]]
    num_classes: int
    deep_supervision: bool = True
    hidden_size: int = 256
    bottleneck: str = "self"       # self | cross | dual_self | none
    dual_skips: bool = False       # concat both skip sets per stage
    merge_skips: bool = False      # v4: merge-conv fusion of skip pairs
    return_last_feature: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, skips, skips2: Optional[List] = None,
                 attn_skip=None, *, train: bool = True):
        n_stages = len(self.features_per_stage)
        dim = len(self.strides[0])

        if self.bottleneck == "self":
            x = _BottleneckSelfAttn(self.hidden_size, dtype=self.dtype,
                                    name="bottleneck")(skips[-1], train=train)
        elif self.bottleneck == "dual_self":
            x1 = _BottleneckSelfAttn(self.hidden_size, dtype=self.dtype,
                                     name="bottleneck1")(skips[-1],
                                                         train=train)
            x2 = _BottleneckSelfAttn(self.hidden_size, dtype=self.dtype,
                                     name="bottleneck2")(skips2[-1],
                                                         train=train)
            x = nn.Conv(self.features_per_stage[-1], (1,) * dim,
                        dtype=self.dtype, name="proj_conv")(
                jnp.concatenate([x1, x2], -1))
        elif self.bottleneck == "cross":
            x1, x2 = _BottleneckCrossAttn(self.hidden_size, dtype=self.dtype,
                                          name="bottleneck")(
                skips[-1], skips2[-1], train=train)
            x = nn.Conv(self.features_per_stage[-1], (1,) * dim,
                        dtype=self.dtype, name="proj_conv")(
                jnp.concatenate([x1, x2], -1))
        else:
            x = attn_skip if attn_skip is not None else skips[-1]

        seg_outputs = []
        last_feature = None
        for s in range(n_stages - 1):
            skip_stage = n_stages - 2 - s
            f = self.features_per_stage[skip_stage]
            stride = tuple(self.strides[skip_stage + 1])
            x = nn.ConvTranspose(f, kernel_size=stride, strides=stride,
                                 dtype=self.dtype, name=f"up{s}")(x)
            if self.dual_skips and skips2 is not None:
                if self.merge_skips:
                    merged = nn.Conv(f, (1,) * dim, dtype=self.dtype,
                                     name=f"merge{s}")(jnp.concatenate(
                                         [skips[skip_stage],
                                          skips2[skip_stage]], -1))
                    x = jnp.concatenate([x, merged.astype(x.dtype)], -1)
                else:
                    x = jnp.concatenate([x, skips[skip_stage].astype(x.dtype),
                                         skips2[skip_stage].astype(x.dtype)],
                                        -1)
            else:
                x = jnp.concatenate([x, skips[skip_stage].astype(x.dtype)], -1)
            x = StackedConvBlocks(self.n_conv_per_stage[s], f,
                                  self.kernel_sizes[skip_stage],
                                  (1,) * dim, dtype=self.dtype,
                                  name=f"stage{s}")(x, train=train)
            last_feature = x
            if self.deep_supervision or s == n_stages - 2:
                seg_outputs.append(
                    nn.Conv(self.num_classes, (1,) * dim, dtype=jnp.float32,
                            name=f"seg{s}")(x.astype(jnp.float32)))

        seg_outputs = seg_outputs[::-1]
        out = seg_outputs if self.deep_supervision else seg_outputs[0]
        if self.return_last_feature:
            return out, last_feature
        return out


def _distance_map(segmentation_onehot: np.ndarray) -> np.ndarray:
    """Per-sample, per-channel EDT of a (B, C, *spatial) one-hot. A single
    EDT over the whole array would measure distances across the batch and
    channel axes too — with ≥2 classes every foreground voxel has a zero
    at channel distance 1, degenerating the map to the mask itself."""
    from scipy.ndimage import distance_transform_edt
    out = np.empty(segmentation_onehot.shape, np.float32)
    for b in range(segmentation_onehot.shape[0]):
        for c in range(segmentation_onehot.shape[1]):
            out[b, c] = distance_transform_edt(segmentation_onehot[b, c])
    return out


class UNetDecoder5Wrapper(nn.Module):
    """reference UNetDecoder5 (:632): cross-attn dual decoder that also
    returns the distance-transform map of the hard segmentation (computed on
    host via pure_callback, exactly as the reference does with scipy)."""
    decoder: AttnUNetDecoderBase

    @nn.compact
    def __call__(self, skips, skips2, *, train: bool = True):
        out = self.decoder(skips, skips2, train=train)
        finest = out[0] if isinstance(out, (list, tuple)) else out
        onehot = jax.nn.one_hot(jnp.argmax(finest, -1), finest.shape[-1],
                                axis=-1)
        onehot = jnp.moveaxis(onehot, -1, 1)  # (B, C, *spatial) like the ref
        dist = jax.pure_callback(
            _distance_map,
            jax.ShapeDtypeStruct(onehot.shape, jnp.float32),
            jax.lax.stop_gradient(onehot), vmap_method="sequential")
        return out, dist
