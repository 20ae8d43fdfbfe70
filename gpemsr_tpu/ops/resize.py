"""Bilinear resize with PyTorch `F.interpolate` semantics.

The reference network is saturated with `F.interpolate(..., mode='bilinear',
align_corners=False)` calls (model/GPEMSR.py:99-110,119,123,128,132,344-371,452-454)
and the SpyNet path uses align_corners=True upsampling. PyTorch's bilinear does
NOT anti-alias on downscale (unlike jax.image.resize), so we implement the exact
source-index formula.

Each axis resize is applied as a dense [out, in] interpolation-matrix matmul
(two nonzeros per row). Profiling showed gather-based resizes running at a few
GB/s on TPU while the equivalent matmul rides the MXU — the matrix is static,
tiny, and numerically exact."""

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


@functools.lru_cache(maxsize=256)
def _resize_matrix(in_size: int, out_size: int, align_corners: bool):
    i0, i1, w1 = _source_coords(in_size, out_size, align_corners)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), 1.0 - w1)
    np.add.at(m, (rows, i1), w1)
    return m


def _resize_axis(x, out_size: int, axis: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(_resize_matrix(in_size, out_size, align_corners))
    if x.dtype != jnp.float32:
        m = m.astype(x.dtype)
    # HIGHEST: the matrix rows ARE the lerp weights — default matmul precision
    # is bf16-multiply on this backend, which would round every interpolation
    # weight (the docstring's exactness claim holds only at HIGHEST)
    y = jnp.tensordot(m, x, axes=[[1], [axis]],
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, 0, axis)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def resize_bilinear(x: jax.Array, out_h: int, out_w: int, align_corners: bool = False):
    """Resize NHWC (or HWC / ...HWC) images to (out_h, out_w), torch-style."""
    x = _resize_axis(x, out_h, x.ndim - 3, align_corners)
    return _resize_axis(x, out_w, x.ndim - 2, align_corners)


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
    x = _resize_axis(x, out_d, x.ndim - 4, align_corners)
    x = _resize_axis(x, out_h, x.ndim - 3, align_corners)
    return _resize_axis(x, out_w, x.ndim - 2, align_corners)
