"""Fused Pallas TPU kernel for the VGG patch-similarity confidence mask.

The prior-fusion mask (models/gpemsr.py::_prior_fusion, reference
GPEMSR.py:345-358) needs, per frame, the per-patch cosine between VGG19
relu1_2 features of the decoded prior image and the bilinearly upsampled LR
frame — two 3x3 convs at the FULL SR resolution (1024^2) whose 64-channel
intermediates round-trip ~134 MB of HBM each, measured at ~4.9 ms per image
on v5e (~5x off roofline; 64 channels also halve MXU lane utilization).

Only 16x16-patch sums of relu1_2 PRODUCTS ever leave the stage, so the
expensive half fuses into one kernel:

  * conv1_1 (3 broadcast channels -> one summed 1-channel conv) stays in
    XLA — 1.2 GFLOP, trivial — expressed as a [C, 9] x [9, HW] matmul over
    the 9-tap shift stack of the single-channel image, so its relu is BORN
    in the channels-in-sublanes layout [C=64, B*(H+2pad)*W] the kernel
    wants (round 3 traced 2.2 ms/section of pure layout copy when this was
    an NHWC conv followed by a transpose).
  * The Pallas kernel processes one 16-row patch band per grid step: DMAs
    the 18-row slab for both images, builds the 3x3 im2col stack
    [9*64, 16*W] with lane rolls (row shifts are aligned lane offsets,
    column shifts roll with a row-boundary mask), and runs conv1_2 as a
    single [64, 576] x [576, 16*W] MXU matmul per image — K=576 instead of
    the 64 XLA contracts, and relu1_2 never touches HBM.
  * relu, the three products (a*b, a*a, b*b), channel sums, and the
    16x16-patch column pools (one-hot matmul) finish in VMEM; the kernel
    writes only the [3, W/16] patch sums per band.

The cosine itself (sqrt/divide on [gh, gw] grids) is negligible and stays
in jnp. Semantics match the unfused path up to f32-vs-bf16 accumulation
order (the unfused path pools in the model's compute dtype; the kernel
accumulates products and pools in f32 — strictly tighter). Gradients are
not defined: nothing trainable feeds the mask inputs (the prior bank is
stop_gradient'ed, GPEMSR.py:361; the LR frame is data), and the caller
wraps the result in stop_gradient to keep that explicit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Test hook: interpret-mode pallas_call + routing off-TPU.
INTERPRET = False

_C = 64            # relu1_2 channels
_PATCH = 16


def _kernel(r1a_ref, r1b_ref, w2t_ref, b2_ref, out_ref,
            xs_a, xs_b, col_ref, r2a_ref, r2b_ref, sem_a, sem_b,
            *, W, GW, LP):
    bi = pl.program_id(0)
    t = pl.program_id(1)
    TL = _PATCH * W                    # lanes per output band
    SL = TL + 2 * W                    # lanes per input slab (1-row halo)

    # images are folded into the lane axis ([C, B*LP]): slicing a tiled
    # sublane-sized middle dim is not Mosaic-sliceable, a lane offset is
    cp_a = pltpu.make_async_copy(
        r1a_ref.at[:, pl.ds(bi * LP + t * TL, SL)], xs_a, sem_a)
    cp_b = pltpu.make_async_copy(
        r1b_ref.at[:, pl.ds(bi * LP + t * TL, SL)], xs_b, sem_b)
    cp_a.start()
    cp_b.start()

    w2t = w2t_ref[:]
    b2 = b2_ref[:, 0:1]
    lane = lax.broadcasted_iota(jnp.int32, (_C, TL), 1) % W

    def relu1_2(xs_ref, r2_ref):
        xs = xs_ref[:]
        # im2col: tap (di, dj) is an aligned lane offset + boundary-masked
        # roll (rolling across a row boundary reads the neighbouring row's
        # edge pixel, which true zero padding would zero)
        for ti, (di, dj) in enumerate(
                (di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)):
            seg = xs[:, (1 + di) * W:(1 + di) * W + TL]
            if dj:
                # Mosaic's lane rotate is 32-bit only ("Rotate with non-32-bit
                # data" for bf16) — round-trip through f32 for packed dtypes
                if seg.dtype.itemsize < 4:
                    seg = pltpu.roll(seg.astype(jnp.float32),
                                     -dj % TL, axis=1).astype(seg.dtype)
                else:
                    seg = pltpu.roll(seg, -dj % TL, axis=1)
                seg = jnp.where(lane == (W - 1 if dj > 0 else 0),
                                jnp.zeros_like(seg), seg)
            col_ref[pl.ds(ti * _C, _C)] = seg
        r2 = jnp.dot(w2t, col_ref[:], preferred_element_type=jnp.float32)
        r2_ref[:] = jnp.maximum(r2 + b2, 0.0)

    cp_a.wait()
    relu1_2(xs_a, r2a_ref)
    cp_b.wait()
    relu1_2(xs_b, r2b_ref)

    # 16x16 patch sums of the three products: channel sum (sublane reduce)
    # then a one-hot column-pool matmul [1, TL] x [TL, GW]
    pool = ((lax.broadcasted_iota(jnp.int32, (TL, GW), 0) % W) // _PATCH ==
            lax.broadcasted_iota(jnp.int32, (TL, GW), 1)).astype(jnp.float32)
    a = r2a_ref[:]
    b = r2b_ref[:]
    rows = []
    for prod in (a * b, a * a, b * b):
        s = jnp.sum(prod, axis=0, keepdims=True)
        rows.append(jnp.dot(s, pool, preferred_element_type=jnp.float32))
    out_ref[0, 0] = jnp.concatenate(rows, axis=0)


def _patch_sums_pallas(r1a, r1b, w2t, b2, B, W, interpret):
    """r1a/r1b: [C, B*(H+2)*W] channel-major relu1_1, images folded into the
    lane axis, one zero pad row per side of each image. Returns
    [B, GH, 3, GW] f32 patch sums (ab, aa, bb)."""
    C, BL = r1a.shape
    L = BL // B
    H = L // W - 2
    GH = H // _PATCH
    GW = W // _PATCH
    TL = _PATCH * W
    dt = r1a.dtype

    return pl.pallas_call(
        functools.partial(_kernel, W=W, GW=GW, LP=L),
        grid=(B, GH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((C, 9 * C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 128), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 3, GW), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, GH, 3, GW), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, TL + 2 * W), dt),
            pltpu.VMEM((C, TL + 2 * W), dt),
            pltpu.VMEM((9 * C, TL), dt),
            pltpu.VMEM((C, TL), jnp.float32),
            pltpu.VMEM((C, TL), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(r1a, r1b, w2t, b2)


def supported(H, W, patch=16):
    """Kernel applicability: 16-pixel patch grid, lane-aligned width."""
    return (patch == _PATCH and H % _PATCH == 0 and W % 128 == 0
            and (jax.default_backend() == "tpu" or INTERPRET))


def vgg_patch_cosine(img_a, img_b, k1, b1, k2, b2, interpret=None):
    """Per-patch cosine of VGG relu1_2 features of two single-channel images.

    img_a/img_b: [B, H, W, 1]; k1/b1, k2/b2: flax conv1_1 ([3,3,3,C]) and
    conv1_2 ([3,3,C,C]) kernels/biases. Both images are (conceptually)
    broadcast to 3 channels, so conv1_1 collapses to a 1-channel conv with
    input-channel-summed weights. Returns [B, H//16, W//16] in f32.
    """
    if interpret is None:
        interpret = INTERPRET
    B, H, W, _ = img_a.shape
    dt = img_a.dtype

    # conv1_1 weights with the 3 broadcast input channels pre-summed:
    # w1t[c, tap] for the 9 taps in (di, dj) raster order
    w1t = jnp.sum(k1.astype(jnp.float32), axis=2).reshape(9, _C).T

    def relu1_1(x):
        # x is NHWC with C=1, so the flat [B, H*W] view is layout-free.
        # conv1_1 over a single channel == [C, 9] x [9, B*H*W] matmul over
        # the 9-tap shift stack; the output is BORN channels-major — no
        # transpose/relayout between here and the kernel's DMA.
        xf = x.reshape(B, H * W)
        row = lax.broadcasted_iota(jnp.int32, (B, H * W), 1) // W
        col = lax.broadcasted_iota(jnp.int32, (B, H * W), 1) % W
        taps = []
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                seg = jnp.roll(xf, -(di * W + dj), axis=1)
                ok = ((row + di >= 0) & (row + di < H)
                      & (col + dj >= 0) & (col + dj < W))
                taps.append(jnp.where(ok, seg, jnp.zeros_like(seg)))
        stack = jnp.stack(taps, axis=0).reshape(9, B * H * W)
        h = jnp.dot(w1t.astype(dt), stack,
                    preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b1.astype(jnp.float32)[:, None], 0.0).astype(dt)
        # one explicit zero pad row per side of each image, then refold the
        # images into the lane axis ([C, B*(H+2)*W])
        h = jnp.pad(h.reshape(_C, B, H * W), ((0, 0), (0, 0), (W, W)))
        return h.reshape(_C, B * (H + 2) * W)

    w2t = k2.reshape(9, _C, _C).transpose(2, 0, 1).reshape(_C, 9 * _C)
    b2c = jnp.broadcast_to(
        b2.astype(jnp.float32).reshape(_C, 1), (_C, 128))

    sums = _patch_sums_pallas(relu1_1(img_a), relu1_1(img_b),
                              w2t.astype(dt), b2c, B, W, interpret)
    ab = sums[:, :, 0]
    aa = sums[:, :, 1]
    bb = sums[:, :, 2]
    return ab / (jnp.sqrt(aa) * jnp.sqrt(bb) + 1e-12)
