"""Shared NHWC flax layers with torch-compatible numerics.

Weight-conversion parity with the reference requires matching torch op
semantics exactly: ConvTranspose2d geometry, GroupNorm(32, eps=1e-6),
parameter-free InstanceNorm2d, LeakyReLU slopes. All modules take/return NHWC."""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def lrelu(x, slope: float = 0.1):
    return jax.nn.leaky_relu(x, negative_slope=slope)


class Conv(nn.Module):
    """3x3/1x1/kxk conv, stride s, zero 'same-like' torch padding p."""
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=[(self.pad, self.pad)] * 2,
                       use_bias=self.use_bias, name="conv")(x)


class ConvTranspose2dTorch(nn.Module):
    """torch nn.ConvTranspose2d(k, stride, padding, output_padding) equivalent.

    Implemented as an input-dilated conv with the spatially-flipped kernel:
    output size = (in-1)*stride - 2*pad + k + output_padding. Used by the
    decoder UpBlock (blocks.py:32-38: k=3, s=2, p=1, op=1 -> exact 2x) and the
    GPEMSR reffea_L{2,3,4} convs (GPEMSR.py:252-254)."""
    features: int
    kernel: int = 3
    stride: int = 2
    pad: int = 1
    output_padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel, self.stride, self.pad, self.output_padding
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (k, k, cin, self.features))
        # flip spatially; conv with lhs dilation = stride
        w = kernel[::-1, ::-1]
        lo = k - 1 - p
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1),
            padding=[(lo, lo + op), (lo, lo + op)],
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out


class GroupNorm32(nn.Module):
    """GroupNorm(num_groups=32, eps=1e-6, affine) — blocks.py:5-6.
    (min(32, C) so tiny test configs work; all reference configs have C>=64.)"""
    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6,
                            name="gn")(x)


def instance_norm(x, eps: float = 1e-5):
    """Parameter-free InstanceNorm2d (discriminator.py:23). NHWC."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


class Dense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, name="dense")(x)


class ResidualBlockNoBN(nn.Module):
    """basicsr ResidualBlockNoBN: conv-relu-conv + identity (GPEMSR.py:7,239)."""
    nf: int = 64

    @nn.compact
    def __call__(self, x):
        out = Conv(self.nf, name="conv1")(x)
        out = jax.nn.relu(out)
        out = Conv(self.nf, name="conv2")(out)
        return x + out


def make_res_blocks(n: int, nf: int, name: str):
    return [ResidualBlockNoBN(nf, name=f"{name}_{i}") for i in range(n)]
