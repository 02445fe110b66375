"""Conv building blocks (flax.linen, channels-last).

TPU-native re-design of the dynamic_network_architectures building blocks the
reference uses (ConvDropoutNormReLU / StackedConvBlocks / residual blocks).
Channels-last layout ((B, *spatial, C)) keeps XLA convolutions in their
native TPU layout; instance norm is GroupNorm with one group per channel."""

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

Shape = Union[int, Sequence[int]]


def _tup(x: Shape, dim: int) -> Tuple[int, ...]:
    return tuple(x) if isinstance(x, (tuple, list)) else (x,) * dim


class ConvNormAct(nn.Module):
    """conv → instance norm → leaky relu (negative_slope 0.01), the reference
    stack's default block (nnU-Net conv_op+InstanceNorm+LeakyReLU)."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    norm: str = "instance"          # instance | batch | none
    act: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = nn.Conv(self.features, kernel_size=tuple(self.kernel_size),
                    strides=tuple(self.strides), padding="SAME",
                    use_bias=True, dtype=self.dtype, name="conv")(x)
        if self.norm == "instance":
            # norm statistics in fp32 for stability
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

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dim = len(self.kernel_size)
        for i in range(self.n_convs):
            stride = self.first_stride if i == 0 else (1,) * dim
            x = ConvNormAct(self.features, self.kernel_size, stride,
                            norm=self.norm, dtype=self.dtype,
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
