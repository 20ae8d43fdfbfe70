"""Pallas TPU kernel for bilinear flow warping (torch grid_sample semantics).

SpyNet's per-level warps (models/spynet.py:61) are the hot half of the flow
estimate: the slab-gather formulation in ops/warp.py issues one 2x2xC gather
per output pixel, measured at ~12 ms for a single 5x256x256x3 warp on v5e —
60% of the whole SpyNet stage. Like the DCN kernel (ops/dcn_pallas.py), the
warp decomposes over a static window of integer displacements; unlike DCN
there are no taps/groups, so the natural layout is the IMAGE layout itself:
rows in sublanes, columns in lanes. Then

  * an x-displacement v is a circular lane roll (wrap reads carry zero
    weight: border-clamped corner coordinates stay inside [0, W-1] whenever
    their bilinear weight is non-zero),
  * a y-displacement u is an 8-aligned sublane slice of 8 row-shifted
    zero-padded copies (same trick as the DCN kernel),
  * per-displacement corner weights come from integer comparison tables,
    precomputed per x-displacement in VMEM scratch,

and every VPU op runs on a dense [H, W] tile — no lane padding, no gather.
Work is O(H*W * window), ~6 ops per shift.

Exactness: identical arithmetic to grid_sample_bilinear (same f32 corner
weights, f32 accumulation) whenever every non-zero-weight corner lies
within the displacement window. `flow_warp_windowed` guards this with a
predicate and falls back to the gather path via lax.cond, so semantics
match torch grid_sample(mode='bilinear', padding_mode='border',
align_corners=True) for arbitrary flows. Gradients are not defined (the
only caller sits under the POD's stop_gradient, GPEMSR.py:99 parity)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpemsr_tpu.ops.warp import grid_sample_bilinear

# Test hook: interpret-mode pallas_call + windowed routing off-TPU.
INTERPRET = False


def _corner_tables(flow, H, W):
    """Border-mode bilinear corner geometry, [B, H, W] each.

    ry/rx: integer corner displacement relative to the output pixel;
    wy0/wy1/wx0/wx1: the separable corner weights (no validity factor —
    border clamping keeps non-zero-weight corners in-image)."""
    flow = flow.astype(jnp.float32)
    B = flow.shape[0]
    gy = jnp.arange(H, dtype=jnp.float32)
    gx = jnp.arange(W, dtype=jnp.float32)
    ix = jnp.clip(gx[None, None, :] + flow[..., 0], 0.0, W - 1)
    iy = jnp.clip(gy[None, :, None] + flow[..., 1], 0.0, H - 1)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0
    ry = y0.astype(jnp.int32) - gy[None, :, None].astype(jnp.int32)
    rx = x0.astype(jnp.int32) - gx[None, None, :].astype(jnp.int32)
    return ry, rx, 1.0 - fy, fy, 1.0 - fx, fx


def _warp_kernel(ry_ref, rx_ref, wy0_ref, wy1_ref, wx0_ref, wx1_ref,
                 xc_ref, out_ref, acc_ref, wxt_ref, *, Ru, Rv, H, W, P0):
    ry = ry_ref[0]
    rx = rx_ref[0]
    wy0 = wy0_ref[0]
    wy1 = wy1_ref[0]

    # per-x-displacement weight tables [NV, H, W]
    wx0 = wx0_ref[0]
    wx1 = wx1_ref[0]
    for vi, v in enumerate(range(-Rv, Rv + 1)):
        wxt_ref[vi] = (jnp.where(rx == v, wx0, 0.0) +
                       jnp.where(rx == v - 1, wx1, 0.0))

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def u_body(ui, carry):
        u = ui - Ru
        wyu = (jnp.where(ry == u, wy0, 0.0) +
               jnp.where(ry == u - 1, wy1, 0.0))
        r = lax.rem(lax.rem(u, 8) + 8, 8)          # u mod 8 in [0, 8)
        start = P0 + u - r                          # multiple of 8
        xs = xc_ref[0, 0, r, pl.ds(pl.multiple_of(start, 8), H), :]
        xs32 = xs.astype(jnp.float32)
        for v in range(-Rv, Rv + 1):
            # lane roll: rolled[w] = xs[(w + v) mod W]; wrap reads only
            # ever meet zero weights (see module docstring)
            xsv = pltpu.roll(xs32, (-v) % W, axis=1)
            acc_ref[:] += (wyu * wxt_ref[v + Rv]) * xsv
        return carry

    lax.fori_loop(0, 2 * Ru + 1, u_body, 0)
    out_ref[0] = acc_ref[:]


def warp_window_ok(flow, H, W, radius):
    """True iff every non-zero-weight bilinear corner displacement lies in
    the window — the exactness predicate for the Pallas warp."""
    ry, rx, wy0, wy1, wx0, wx1 = _corner_tables(flow, H, W)
    R = int(radius)
    oky = ((((ry >= -R) & (ry <= R)) | (wy0 == 0)) &
           (((ry + 1 >= -R) & (ry + 1 <= R)) | (wy1 == 0)))
    okx = ((((rx >= -R) & (rx <= R)) | (wx0 == 0)) &
           (((rx + 1 >= -R) & (rx + 1 <= R)) | (wx1 == 0)))
    return jnp.all(oky & okx)


def _flow_warp_pallas(x, flow, radius, interpret):
    B, H, W, C = x.shape
    Ru = Rv = int(radius)
    NV = 2 * Rv + 1
    P0 = ((Ru + 7) // 8) * 8                   # aligned top/bottom row pad

    ry, rx, wy0, wy1, wx0, wx1 = _corner_tables(flow, H, W)

    # 8 row-shifted zero-padded copies per (b, c): [B, C, 8, Hpad, W]
    xbc = x.transpose(0, 3, 1, 2)                         # [B, C, H, W]
    zp = jnp.zeros((B, C, P0, W), x.dtype)
    xp = jnp.concatenate([zp, xbc, zp,
                          jnp.zeros((B, C, 8, W), x.dtype)], axis=2)
    HP = H + 2 * P0
    xcopies = jnp.stack([xp[:, :, r:r + HP] for r in range(8)], axis=2)

    tile = lambda: pl.BlockSpec((1, H, W), lambda b, c: (b, 0, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_warp_kernel, Ru=Ru, Rv=Rv, H=H, W=W, P0=P0),
        grid=(B, C),
        in_specs=[tile(), tile(), tile(), tile(), tile(), tile(),
                  pl.BlockSpec((1, 1, 8, HP, W), lambda b, c: (b, c, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda b, c: (b * C + c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * C, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H, W), jnp.float32),
            pltpu.VMEM((NV, H, W), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ry, rx, wy0, wy1, wx0, wx1, xcopies)
    return (out.reshape(B, C, H, W).transpose(0, 2, 3, 1).astype(x.dtype))


def flow_warp_windowed(x, flow, radius: int = 8, interpret=None):
    """Border-mode bilinear flow warp, Pallas windowed-shift kernel with an
    exactness guard falling back to the slab-gather path.

    x [B, H, W, C], flow [B, H, W, 2] with (dx, dy) channels, as
    ops/warp.py::flow_warp(padding_mode='border'). Requires W a multiple of
    128 (lane width) and H a multiple of 8; callers route other shapes to
    the gather path."""
    if interpret is None:
        interpret = INTERPRET
    B, H, W, C = x.shape

    def _pallas(ops):
        xx, ff = ops
        return _flow_warp_pallas(xx, ff, radius, interpret)

    def _gather(ops):
        xx, ff = ops
        from gpemsr_tpu.ops.warp import flow_warp
        return flow_warp(xx, ff, padding_mode="border")

    from gpemsr_tpu.ops import guard
    if guard.deferring():
        # deferred-guard inference (ops/guard.py): no per-call cond; the
        # caller recomputes the whole wrapped fn exactly on any guard miss
        guard.record(warp_window_ok(flow, H, W, radius))
        return _flow_warp_pallas(x, flow, radius, interpret)

    ok = warp_window_ok(flow, H, W, radius)
    return lax.cond(ok, _pallas, _gather, (x, flow))


def spynet_flow_warp(x, flow, radius: int = 8):
    """The warp SpyNet's pyramid loop calls: Pallas windowed kernel on TPU
    for lane-aligned levels (W multiple of 128, H of 8), slab gather
    otherwise. Semantics always == flow_warp(padding_mode='border')."""
    from gpemsr_tpu.ops import guard
    B, H, W, C = x.shape
    use_pallas = (W % 128 == 0 and H % 8 == 0 and
                  (jax.default_backend() == "tpu" or INTERPRET) and
                  not guard.forcing_exact())
    if use_pallas:
        return flow_warp_windowed(x, flow, radius=radius)
    from gpemsr_tpu.ops.warp import flow_warp
    return flow_warp(x, flow, padding_mode="border")
