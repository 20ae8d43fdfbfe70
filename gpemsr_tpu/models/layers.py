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
    """3x3/1x1/kxk conv, stride s, zero 'same-like' torch padding p.

    zero_init: initialize kernel AND bias to zero — basicsr's DCNv2Pack
    convention for the offset-predicting conv (init_offset zeroes it so the
    DCN starts as a plain conv); used by DCNPack.conv_offset for parity."""
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    use_bias: bool = True
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        kw = ({"kernel_init": nn.initializers.zeros}
              if self.zero_init else {})
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=[(self.pad, self.pad)] * 2,
                       use_bias=self.use_bias, name="conv", **kw)(x)


class _TorchConvParams(nn.Module):
    """Parameter holder matching Conv's inner nn.Conv layout/init, so modules
    that need the raw kernel stay checkpoint-compatible with Conv."""
    features: int
    kernel: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, self.in_features,
                        self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class SubpixelConvShuffle(nn.Module):
    """Conv(C*r*r) followed by PixelShuffle(r), keeping channels as the minor
    (lane) dimension through the depth-to-space.

    Numerically identical to ``pixel_shuffle(Conv(C*r*r)(x), r)`` with torch
    channel order out[c*r*r + i*r + j] (reference GPEMSR.py:316,442-448), and
    checkpoint-compatible with it: the kernel is stored in torch output-channel
    order (params ``<name>/conv/{kernel,bias}``, same shapes/init as Conv) and
    re-packed to [i, j, c] order at apply time — a transpose of a small weight
    tensor instead of the lane-crossing activation transpose XLA materializes
    for the torch order (traced at 0.8 ms/section for the final 512^2->1024^2
    shuffle). The activation depth-to-space then only swaps W with the r
    sublane dims while the lane dim C stays minor and untouched."""
    features: int          # C * r * r, torch channel packing
    r: int = 2
    pad: int = 1

    @nn.compact
    def __call__(self, x):
        r = self.r
        C = self.features // (r * r)
        k, b = _TorchConvParams(self.features, 2 * self.pad + 1, x.shape[-1],
                                name="conv")()
        kh, kw, cin, _ = k.shape
        # reorder output channels [c, i, j] -> [i, j, c] (weights, not data)
        kp = k.reshape(kh, kw, cin, C, r, r)
        kp = jnp.transpose(kp, (0, 1, 2, 4, 5, 3)).reshape(kh, kw, cin,
                                                           self.features)
        bp = jnp.transpose(b.reshape(C, r, r), (1, 2, 0)).reshape(-1)
        dt = jnp.promote_types(x.dtype, k.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(dt), kp.astype(dt), window_strides=(1, 1),
            padding=[(self.pad, self.pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bp.astype(dt)
        B, H, W, _ = y.shape
        y = y.reshape(B, H, W, r, r, C)
        y = y.transpose(0, 1, 3, 2, 4, 5)      # B, H, i, W, j, C — lane fixed
        return y.reshape(B, H * r, W * r, C)


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
