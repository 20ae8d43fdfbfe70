"""Bilinear resize with PyTorch `F.interpolate` semantics.

The reference network is saturated with `F.interpolate(..., mode='bilinear',
align_corners=False)` calls (model/GPEMSR.py:99-110,119,123,128,132,344-371,452-454)
and the SpyNet path uses align_corners=True upsampling. PyTorch's bilinear does
NOT anti-alias on downscale (unlike jax.image.resize), so we implement the exact
source-index formula as two separable gather passes. Gathers are contiguous and
monotonic, which XLA lowers to cheap dynamic-slices on TPU; the weighted blend
fuses into neighbouring elementwise work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _source_coords(in_size: int, out_size: int, align_corners: bool):
    """Static (numpy) source indices + lerp weights for one axis."""
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros_like(i)
        else:
            src = i * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (i + 0.5) * scale - 0.5
        src = np.maximum(src, 0.0)  # torch clamps negative source indices
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    return i0, i1, w1


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def resize_bilinear(x: jax.Array, out_h: int, out_w: int, align_corners: bool = False):
    """Resize NHWC (or HWC / ...HWC) images to (out_h, out_w), torch-style."""
    h, w = x.shape[-3], x.shape[-2]
    dtype = x.dtype
    if (h, w) == (out_h, out_w):
        return x
    xf = x.astype(jnp.float32)
    if h != out_h:
        i0, i1, w1 = _source_coords(h, out_h, align_corners)
        a = jnp.take(xf, jnp.asarray(i0), axis=-3)
        b = jnp.take(xf, jnp.asarray(i1), axis=-3)
        wt = jnp.asarray(w1).reshape((-1, 1, 1))
        xf = a * (1.0 - wt) + b * wt
    if w != out_w:
        i0, i1, w1 = _source_coords(w, out_w, align_corners)
        a = jnp.take(xf, jnp.asarray(i0), axis=-2)
        b = jnp.take(xf, jnp.asarray(i1), axis=-2)
        wt = jnp.asarray(w1).reshape((-1, 1))
        xf = a * (1.0 - wt) + b * wt
    return xf.astype(dtype)


def interpolate(x: jax.Array, scale_factor: float, align_corners: bool = False):
    """`F.interpolate(x, scale_factor=s, mode='bilinear')` for NHWC inputs.

    Matches torch's floor(size * scale) output-size rule."""
    h, w = x.shape[-3], x.shape[-2]
    out_h = int(np.floor(h * scale_factor))
    out_w = int(np.floor(w * scale_factor))
    return resize_bilinear(x, out_h, out_w, align_corners)


def resize_trilinear(x: jax.Array, out_d: int, out_h: int, out_w: int,
                     align_corners: bool = True):
    """Trilinear resize for NDHWC volumes (seg U-Net upsampling uses
    `nn.Upsample(mode='trilinear', align_corners=True)`, basic.py:150)."""
    d = x.shape[-4]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if d != out_d:
        i0, i1, w1 = _source_coords(d, out_d, align_corners)
        a = jnp.take(xf, jnp.asarray(i0), axis=-4)
        b = jnp.take(xf, jnp.asarray(i1), axis=-4)
        wt = jnp.asarray(w1).reshape((-1, 1, 1, 1))
        xf = a * (1.0 - wt) + b * wt
    xf = resize_bilinear(xf, out_h, out_w, align_corners)
    return xf.astype(dtype)
