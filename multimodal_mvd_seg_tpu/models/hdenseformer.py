"""HDenseFormer building blocks (densely-connected transformer).

Parity: reference my_network/my_network/HDenseFormer.py (136 LoC), which
ships broken (``PreNorm.__init__`` calls ``super.__init__()`` at :13;
``Dense_TransformerBlock`` defines ``__int__`` instead of ``__init__`` at
:90 — SURVEY.md §0). Reconstructed working: DenseForward (MLP),
Dense_Attention (MHSA), DensePreConv_AttentionBlock (dense connectivity:
each block consumes the 1×1-projected concat of all previous outputs), and
Dense_TransformerBlock (stack over a patch-embedded volume).
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class PreNorm(nn.Module):
    fn: nn.Module

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        return self.fn(nn.LayerNorm(dtype=jnp.float32,
                                    name="norm")(x).astype(x.dtype),
                       *args, **kwargs)


class DenseForward(nn.Module):
    """Token MLP (reference HDenseFormer.DenseForward)."""
    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.dim, name="fc2")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class Dense_Attention(nn.Module):
    """MHSA over tokens (B, N, C) (reference Dense_Attention)."""
    dim: int
    heads: int = 8
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        B, N, C = x.shape
        h = self.heads
        qkv = nn.DenseGeneral((3, h, C // h), use_bias=False,
                              name="qkv")(x).astype(jnp.float32)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) * (C // h) ** -0.5, -1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, name="proj")(out.astype(x.dtype))


class DensePreConv_AttentionBlock(nn.Module):
    """Densely-connected attention blocks: block i consumes a 1×1-conv
    projection of the concat of all previous outputs."""
    dim: int
    depth: int = 4
    heads: int = 8
    mlp_ratio: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        outputs = [x]
        for i in range(self.depth):
            inp = outputs[0] if len(outputs) == 1 else \
                nn.Dense(self.dim, name=f"dense_proj{i}")(
                    jnp.concatenate(outputs, -1))
            a = PreNorm(Dense_Attention(self.dim, self.heads, self.dropout),
                        name=f"attn{i}")(inp, train=train)
            h = inp + a
            m = PreNorm(DenseForward(self.dim, self.dim * self.mlp_ratio,
                                     self.dropout), name=f"mlp{i}")(
                h, train=train)
            outputs.append(h + m)
        return outputs[-1]


class Dense_TransformerBlock(nn.Module):
    """Patch-embed a volume and run the dense attention stack, returning a
    volume of the same spatial grid (reference Dense_TransformerBlock)."""
    in_channels: int
    dim: int
    patch_size: Sequence[int] = (4, 4, 4)
    depth: int = 4
    heads: int = 8
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        p = tuple(self.patch_size)
        x = nn.Conv(self.dim, p, strides=p, name="patch_embed")(x)
        B = x.shape[0]
        spatial = x.shape[1:-1]
        tokens = x.reshape(B, -1, self.dim)
        pe = self.param("pos_embed", nn.initializers.zeros,
                        (1, tokens.shape[1], self.dim), jnp.float32)
        tokens = tokens + pe.astype(tokens.dtype)
        tokens = DensePreConv_AttentionBlock(
            self.dim, self.depth, self.heads, dropout=self.dropout,
            name="blocks")(tokens, train=train)
        return tokens.reshape(B, *spatial, self.dim)
