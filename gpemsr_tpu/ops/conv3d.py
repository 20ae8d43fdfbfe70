"""3-D convolution as a sum of z-shifted 2-D convolutions.

XLA's TPU lowering of Conv3D is far off peak (profiled ~0.4 TFLOP/s on the
Superhuman net); decomposing a (kd, kh, kw) conv into kd batched 2-D convs
over z-shifted views puts the work on the well-tiled 2-D conv path. The flax
module keeps nn.Conv's parameter layout ((kd, kh, kw, Cin, Cout) kernel +
bias) so converted checkpoints are drop-in."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def conv3d_zsum(x: jax.Array, kernel: jax.Array,
                padding: Sequence[tuple[int, int]],
                strides: Sequence[int] = (1, 1, 1)) -> jax.Array:
    """NDHWC conv via z-decomposition. padding: ((pd,pd'),(ph,ph'),(pw,pw'))."""
    B, D, H, W, C = x.shape
    kd, kh, kw, _, Co = kernel.shape
    sd, sh, sw = strides
    (pd0, pd1), ph, pw = padding
    if pd0 or pd1:
        x = jnp.pad(x, ((0, 0), (pd0, pd1), (0, 0), (0, 0), (0, 0)))
    Dp = x.shape[1]
    out_d = (Dp - kd) // sd + 1

    out = None
    for dz in range(kd):
        xz = x[:, dz: dz + (out_d - 1) * sd + 1: sd]      # [B, out_d, H, W, C]
        xz = xz.reshape(B * out_d, H, W, C)
        y = lax.conv_general_dilated(
            xz, kernel[dz], window_strides=(sh, sw), padding=(ph, pw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y if out is None else out + y
    oh, ow = out.shape[1], out.shape[2]
    return out.reshape(B, out_d, oh, ow, Co)


class Conv3D(nn.Module):
    """Drop-in for nn.Conv over NDHWC with the z-sum decomposition.
    padding: 'VALID' or per-dim (p, p) like our seg models use."""
    features: int
    kernel_size: tuple[int, int, int]
    strides: tuple[int, int, int] = (1, 1, 1)
    padding: str | Sequence = "VALID"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kd, kh, kw, cin, self.features))
        if self.padding == "VALID":
            pad = ((0, 0), (0, 0), (0, 0))
        else:
            pad = tuple((p, p) if isinstance(p, int) else tuple(p)
                        for p in self.padding)
        y = conv3d_zsum(x, kernel, pad, self.strides)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y
