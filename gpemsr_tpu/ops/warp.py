"""Bilinear sampling / optical-flow warping (torch `grid_sample` semantics).

Used by the SpyNet coarse-to-fine loop (basicsr spynet warps the supporting
frame by the upsampled flow with padding_mode='border', align_corners=True).
Implemented as a flattened gather of the four corner texels + lerp; the gather
index arithmetic is vectorised so XLA emits a single gather per corner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear(x: jax.Array, ix: jax.Array, iy: jax.Array,
                         padding_mode: str = "zeros") -> jax.Array:
    """Sample NHWC `x` at absolute pixel coordinates (ix, iy), shape [B, H', W'].

    Equivalent to torch grid_sample(mode='bilinear', align_corners=True) after
    converting the normalized grid to absolute coordinates:
        ix = (gx + 1) / 2 * (W - 1),  iy = (gy + 1) / 2 * (H - 1).
    """
    B, H, W, C = x.shape
    out_h, out_w = ix.shape[-2], ix.shape[-1]

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, W - 1)
        iy = jnp.clip(iy, 0.0, H - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    if padding_mode == "zeros":
        vx0 = (x0i >= 0) & (x0i <= W - 1)
        vx1 = (x1i >= 0) & (x1i <= W - 1)
        vy0 = (y0i >= 0) & (y0i <= H - 1)
        vy1 = (y1i >= 0) & (y1i <= H - 1)
    else:
        vx0 = vx1 = vy0 = vy1 = None

    x0c = jnp.clip(x0i, 0, W - 1)
    x1c = jnp.clip(x1i, 0, W - 1)
    y0c = jnp.clip(y0i, 0, H - 1)
    y1c = jnp.clip(y1i, 0, H - 1)

    flat = x.reshape(B, H * W, C)

    def gather(yy, xx):
        idx = yy * W + xx                       # [B, out_h, out_w]
        idx = idx.reshape(B, out_h * out_w)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return g.reshape(B, out_h, out_w, C)

    v00 = gather(y0c, x0c)
    v01 = gather(y0c, x1c)
    v10 = gather(y1c, x0c)
    v11 = gather(y1c, x1c)

    w00 = ((1 - fy) * (1 - fx))[..., None]
    w01 = ((1 - fy) * fx)[..., None]
    w10 = (fy * (1 - fx))[..., None]
    w11 = (fy * fx)[..., None]

    if padding_mode == "zeros":
        w00 = w00 * (vy0 & vx0)[..., None]
        w01 = w01 * (vy0 & vx1)[..., None]
        w10 = w10 * (vy1 & vx0)[..., None]
        w11 = w11 * (vy1 & vx1)[..., None]

    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def flow_warp(x: jax.Array, flow: jax.Array, padding_mode: str = "zeros") -> jax.Array:
    """Warp NHWC `x` by flow [B, H, W, 2] (last dim = (dx, dy) like basicsr).

    Matches basicsr `flow_warp` (align_corners=True): sample position for output
    pixel (h, w) is (w + flow_x, h + flow_y)."""
    B, H, W, _ = flow.shape
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=flow.dtype),
                          jnp.arange(W, dtype=flow.dtype), indexing="ij")
    ix = gx[None] + flow[..., 0]
    iy = gy[None] + flow[..., 1]
    return grid_sample_bilinear(x, ix, iy, padding_mode=padding_mode)
