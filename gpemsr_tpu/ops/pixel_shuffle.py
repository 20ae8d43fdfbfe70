"""PixelShuffle (depth-to-space) with torch channel ordering, NHWC layout.

torch.nn.PixelShuffle(r): out[c, h*r+i, w*r+j] = in[c*r*r + i*r + j, h, w]
(model/GPEMSR.py:316,442-448). In NHWC this is a pure reshape/transpose that XLA
fuses into the producing convolution — no data movement cost on TPU."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_shuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """[B, H, W, C*r*r] -> [B, H*r, W*r, C] with torch channel convention."""
    B, H, W, Crr = x.shape
    C = Crr // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)        # B, H, i, W, j, C
    return x.reshape(B, H * r, W * r, C)


def pixel_unshuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """Inverse of pixel_shuffle."""
    B, Hr, Wr, C = x.shape
    H, W = Hr // r, Wr // r
    x = x.reshape(B, H, r, W, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)        # B, H, W, C, i, j
    return x.reshape(B, H, W, C * r * r)
