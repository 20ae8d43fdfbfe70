"""Bilinear sampling / optical-flow warping (torch `grid_sample` semantics).

Used by the SpyNet coarse-to-fine loop (basicsr spynet warps the supporting
frame by the upsampled flow with padding_mode='border', align_corners=True).
Each sample fetches its whole 2x2xC bilinear corner block in ONE lax.gather
(profiling showed four narrow per-corner gathers dominated; one wide slab
quadruples gather width). Coordinate math stays f32 — under bf16 inference,
absolute pixel positions lose their fractional part."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def grid_sample_bilinear(x: jax.Array, ix: jax.Array, iy: jax.Array,
                         padding_mode: str = "zeros") -> jax.Array:
    """Sample NHWC `x` at absolute pixel coordinates (ix, iy), shape [B, H', W'].

    Equivalent to torch grid_sample(mode='bilinear', align_corners=True) after
    converting the normalized grid to absolute coordinates:
        ix = (gx + 1) / 2 * (W - 1),  iy = (gy + 1) / 2 * (H - 1).
    """
    B, H, W, C = x.shape
    out_h, out_w = ix.shape[-2], ix.shape[-1]

    ix = ix.astype(jnp.float32)
    iy = iy.astype(jnp.float32)

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, W - 1)
        iy = jnp.clip(iy, 0.0, H - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if padding_mode == "zeros":
        vx0 = (x0i >= 0) & (x0i <= W - 1)
        vx1 = (x0i + 1 >= 0) & (x0i + 1 <= W - 1)
        vy0 = (y0i >= 0) & (y0i <= H - 1)
        vy1 = (y0i + 1 >= 0) & (y0i + 1 <= H - 1)
        m00 = (vy0 & vx0).astype(jnp.float32)
        m01 = (vy0 & vx1).astype(jnp.float32)
        m10 = (vy1 & vx0).astype(jnp.float32)
        m11 = (vy1 & vx1).astype(jnp.float32)
    else:
        m00 = m01 = m10 = m11 = 1.0

    # single 2x2xC slab gather per sample
    by = jnp.clip(y0i, 0, max(H - 2, 0))
    bx = jnp.clip(x0i, 0, max(W - 2, 0))
    NP = out_h * out_w
    starts = jnp.stack([by.reshape(B, NP), bx.reshape(B, NP)], axis=-1)

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    sh, sw = min(2, H), min(2, W)          # degenerate 1-wide/1-tall inputs
    slab = lax.gather(x, starts, dnums, slice_sizes=(1, sh, sw, C),
                      mode=lax.GatherScatterMode.CLIP)
    slab = slab.reshape(B, out_h, out_w, sh, sw, C).astype(jnp.float32)
    if sh == 1:
        slab = jnp.concatenate([slab, slab], axis=-3)
    if sw == 1:
        slab = jnp.concatenate([slab, slab], axis=-2)

    sy0 = jnp.clip(y0i - by, 0, 1)
    sx0 = jnp.clip(x0i - bx, 0, 1)
    sy1 = jnp.clip(y0i + 1 - by, 0, 1)
    sx1 = jnp.clip(x0i + 1 - bx, 0, 1)

    def pick(sy, sx):
        row = jnp.where((sy == 0)[..., None, None],
                        slab[..., 0, :, :], slab[..., 1, :, :])
        return jnp.where((sx == 0)[..., None], row[..., 0, :], row[..., 1, :])

    w00 = ((1 - fy) * (1 - fx) * m00)[..., None]
    w01 = ((1 - fy) * fx * m01)[..., None]
    w10 = (fy * (1 - fx) * m10)[..., None]
    w11 = (fy * fx * m11)[..., None]

    out = (pick(sy0, sx0) * w00 + pick(sy0, sx1) * w01 +
           pick(sy1, sx0) * w10 + pick(sy1, sx1) * w11)
    return out.astype(x.dtype)


def flow_warp(x: jax.Array, flow: jax.Array, padding_mode: str = "zeros") -> jax.Array:
    """Warp NHWC `x` by flow [B, H, W, 2] (last dim = (dx, dy) like basicsr).

    Matches basicsr `flow_warp` (align_corners=True): sample position for output
    pixel (h, w) is (w + flow_x, h + flow_y)."""
    B, H, W, _ = flow.shape
    flow = flow.astype(jnp.float32)
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ix = gx[None] + flow[..., 0]
    iy = gy[None] + flow[..., 1]
    return grid_sample_bilinear(x, ix, iy, padding_mode=padding_mode)
