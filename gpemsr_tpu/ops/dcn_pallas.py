"""Pallas TPU kernel for modulated deformable conv (DCNv2) at inference scale.

The reference's one custom CUDA kernel (basicsr DCNv2Pack, model/GPEMSR.py:79-94)
re-thought for the TPU memory system instead of translated: deformable
sampling is decomposed over a static window of integer displacements
(u, v) ∈ [-Ru, Ru] x [-Rv, Rv]. For each shift the kernel

  1. selects, on the VPU, the bilinear-corner weight each (pixel, tap, group)
     assigns to that displacement (two table lookups built once per tile),
  2. expands (tap, group) weights to (tap, channel) lanes with one constant
     one-hot MXU matmul (fuses the k-broadcast and the group->channel map),
  3. FMAs the statically-shifted feature rows into a per-tap accumulator.

Work is O(HW * K * G * window) instead of the one-hot-matmul's
O(HW * K * G * HW) — 24x fewer ops at the 64x64 L1 level — and entirely
VMEM-resident: no HBM gather, no materialized one-hot.

Static shifts come from 8 row-shifted copies of the (zero-padded, flattened)
feature map, because Mosaic requires dynamic sublane starts to be 8-aligned:
shift s reads copy (s mod 8) at the 8-aligned start (s - s mod 8).

Exactness: bit-equal to the gather formulation whenever every non-zero
bilinear corner lies within the window (|floor(offset)| <= R - 2 for 3x3
kernels). `ops/dcn.py::deform_conv2d` (window_radius > 0) guards this with a
cheap predicate and `lax.cond`s to the exact XLA slab-gather path otherwise,
so semantics match torchvision's deform_conv2d for arbitrary offsets."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _geometry(offset, H, W, kernel_size, padding):
    """Per-(pixel, tap, group) integer corner displacement + corner weights.

    Returns ry, rx int32 and fy, fx, vy0, vy1, vx0, vx1 float32, each
    [B, H, W, G, K]; ry is floor(sample_y) - pixel_y (pixel-relative)."""
    B = offset.shape[0]
    G = offset.shape[-1] // (2 * kernel_size * kernel_size)
    K = kernel_size * kernel_size
    off = offset.astype(jnp.float32).reshape(B, H, W, G, K, 2)
    dy, dx = off[..., 0], off[..., 1]
    ki = jnp.arange(kernel_size, dtype=jnp.float32)
    ty = jnp.repeat(ki, kernel_size)
    tx = jnp.tile(ki, kernel_size)
    gy = jnp.arange(H, dtype=jnp.float32)
    gx = jnp.arange(W, dtype=jnp.float32)
    py = -padding + ty[None, None, None, None, :] + dy   # relative to pixel y
    px = -padding + tx[None, None, None, None, :] + dx
    ry = jnp.floor(py)
    rx = jnp.floor(px)
    fy = py - ry
    fx = px - rx
    ay0 = gy[None, :, None, None, None] + ry             # absolute corner y
    ax0 = gx[None, None, :, None, None] + rx
    vy0 = ((ay0 >= 0) & (ay0 <= H - 1)).astype(jnp.float32)
    vy1 = ((ay0 + 1 >= 0) & (ay0 + 1 <= H - 1)).astype(jnp.float32)
    vx0 = ((ax0 >= 0) & (ax0 <= W - 1)).astype(jnp.float32)
    vx1 = ((ax0 + 1 >= 0) & (ax0 + 1 <= W - 1)).astype(jnp.float32)
    return (ry.astype(jnp.int32), rx.astype(jnp.int32),
            fy, fx, vy0, vy1, vx0, vx1)


def _to_kg(t, B, R, K, G):
    """[B, H, W, G, K] -> [B, R, K*G] with k-major lane layout."""
    return t.reshape(B, R, G, K).transpose(0, 1, 3, 2).reshape(B, R, K * G)


@functools.lru_cache(maxsize=8)
def _expand_matrix(K, G, Cg):
    """[K*G, K*C] one-hot: (k*G+g) -> lanes k*C + [g*Cg, (g+1)*Cg)."""
    C = G * Cg
    m = np.zeros((K * G, K * C), np.float32)
    for k in range(K):
        for g in range(G):
            m[k * G + g, k * C + g * Cg:(k * C) + (g + 1) * Cg] = 1.0
    return m


def _dcn_kernel(ry_ref, rx_ref, wy0_ref, wy1_ref, wx0_ref, wx1_ref,
                xc_ref, rmat_ref, wconv_ref, out_ref,
                acc_ref, wxe_ref,
                *, Ru, Rv, TP, W, C, K, G, PW, exact):
    t = pl.program_id(1)
    ry = ry_ref[0]
    wy0 = wy0_ref[0]
    wy1 = wy1_ref[0]
    rx = rx_ref[0]
    wx0 = wx0_ref[0]
    wx1 = wx1_ref[0]
    rmat = rmat_ref[:]

    # Factorized weight expansion: rmat is a one-hot selection, so
    # dot(wy*wx, rmat) == dot(wy, rmat) * dot(wx, rmat) BIT-EXACTLY (each
    # output lane selects one (k, g) entry; multiply-then-select equals
    # select-then-multiply). Expanding the NV x-tables and NU y-rows
    # separately needs NU+NV dots per tile instead of NU*NV — 18 vs 81 at
    # radius 4, cutting the kernel's dominant MXU cost ~4.5x.
    # per-x-displacement EXPANDED corner weights [NV, TP, K*C]
    for vi, v in enumerate(range(-Rv, Rv + 1)):
        wxv = (jnp.where(rx == v, wx0, 0.0) +
               jnp.where(rx == v - 1, wx1, 0.0))
        # HIGHEST: bilinear weights must not round to bf16 (rmat is 0/1)
        wxe_ref[vi] = jnp.dot(wxv, rmat, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)

    acc_ref[:] = jnp.zeros_like(acc_ref)

    # Outer loop over y-displacement u is a DYNAMIC fori_loop: u*W is a
    # multiple of 8 so the row start stays provably 8-aligned, and keeping it
    # dynamic shrinks the unrolled kernel ~NUx (the remote Mosaic compiler
    # fails on the fully-unrolled (u, v) product when the kernel appears more
    # than once in a module). Only the v loop (static copy index v % 8) must
    # be unrolled.
    def u_body(ui, carry):
        u = ui - Ru
        wyu = (jnp.where(ry == u, wy0, 0.0) +
               jnp.where(ry == u - 1, wy1, 0.0))
        wye = jnp.dot(wyu, rmat, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        row0 = t * TP + PW + u * W
        for v in range(-Rv, Rv + 1):
            r = v % 8                              # python mod: 0..7
            start = row0 + (v - r)                 # all terms multiples of 8
            xs = xc_ref[0, r, pl.ds(pl.multiple_of(start, 8), TP), :]
            xrep = pltpu.repeat(xs, K, axis=1).astype(jnp.float32)
            acc_ref[:] += (wye * wxe_ref[v + Rv]) * xrep
        return carry

    lax.fori_loop(0, 2 * Ru + 1, u_body, 0)
    out_ref[0] = jnp.dot(
        acc_ref[:], wconv_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if exact else None)


# Test hook: when True, pallas_call runs in interpret mode and ops/dcn.py
# routes to the windowed path even off-TPU (CPU differential tests).
INTERPRET = False


def parse_radius(radius):
    """(Ry, Rx) from an int (symmetric) or a 2-sequence (anisotropic).

    Serial-section EM motion is anisotropic in practice — the trained x8
    checkpoint probes at (Ry, Rx) = (6, 4) for its cascade DCN — and kernel
    cost is ~(2Ry+1)*(2Rx+1), so per-axis sizing buys a real cut (117 vs 169
    shifts there). Returns plain ints (hashable: the radius rides through
    jit/custom_vjp as a static argument)."""
    if isinstance(radius, (tuple, list)):
        ry, rx = radius
        return int(ry), int(rx)
    return int(radius), int(radius)


def deform_conv2d_windowed(x, offset, mask, weight, bias=None,
                           kernel_size=3, padding=1, deformable_groups=8,
                           radius=6, sample_dtype=jnp.bfloat16,
                           interpret=None):
    """Windowed Pallas DCNv2 forward. Exact iff all non-zero bilinear corners
    fall in the (2*Ry+1) x (2*Rx+1) displacement window (see module
    docstring); `radius` is an int (symmetric) or (Ry, Rx) — see
    `parse_radius`. Use `ops/dcn.py::deform_conv2d` with window_radius > 0
    for the guarded (and differentiable) variant.

    x [B,H,W,C]; offset [B,H,W,2*G*K] torch-interleaved (dy,dx); mask
    [B,H,W,G*K] pre-sigmoid-activated or None; weight [K,Cin,Cout]."""
    if interpret is None:
        interpret = INTERPRET
    B, H, W, Cin = x.shape
    K = kernel_size * kernel_size
    G = deformable_groups
    Cg = Cin // G
    R = H * W
    Ru, Rv = parse_radius(radius)
    PW = (Ru + 1) * W

    TP = 256
    while R % TP:
        TP //= 2
    if TP < 8:
        raise ValueError(f"H*W={R} not divisible by a usable tile size")

    ry, rx, fy, fx, vy0, vy1, vx0, vx1 = _geometry(
        offset, H, W, kernel_size, padding)
    m = (jnp.ones((B, H, W, G, K), jnp.float32) if mask is None
         else mask.astype(jnp.float32).reshape(B, H, W, G, K))
    wy0 = (1 - fy) * vy0 * m
    wy1 = fy * vy1 * m
    wx0 = (1 - fx) * vx0
    wx1 = fx * vx1

    kg = lambda t: _to_kg(t, B, R, K, G)                     # noqa: E731
    ry_l, rx_l = kg(ry), kg(rx)
    wy0_l, wy1_l, wx0_l, wx1_l = kg(wy0), kg(wy1), kg(wx0), kg(wx1)

    # 8 row-shifted zero-padded copies for 8-aligned dynamic sublane starts
    xf = x.reshape(B, R, Cin).astype(sample_dtype)
    zpad = jnp.zeros((B, PW, Cin), sample_dtype)
    xp = jnp.concatenate([zpad, xf, zpad,
                          jnp.zeros((B, 8, Cin), sample_dtype)], axis=1)
    RPAD = R + 2 * PW
    xcopies = jnp.stack([xp[:, r:r + RPAD] for r in range(8)], axis=1)

    rmat = jnp.asarray(_expand_matrix(K, G, Cg))
    Cout = weight.shape[-1]
    wmat = weight.reshape(K * Cin, Cout).astype(jnp.float32)

    NV = 2 * Rv + 1
    grid = (B, R // TP)
    tile72 = lambda: pl.BlockSpec((1, TP, K * G), lambda b, t: (b, t, 0),  # noqa: E731
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_dcn_kernel, Ru=Ru, Rv=Rv, TP=TP, W=W, C=Cin,
                          K=K, G=G, PW=PW,
                          exact=sample_dtype == jnp.float32),
        grid=grid,
        in_specs=[tile72(), tile72(), tile72(), tile72(), tile72(), tile72(),
                  pl.BlockSpec((1, 8, RPAD, Cin), lambda b, t: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TP, Cout), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, Cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TP, K * Cin), jnp.float32),
            pltpu.VMEM((NV, TP, K * Cin), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ry_l, rx_l, wy0_l, wy1_l, wx0_l, wx1_l, xcopies, rmat, wmat)

    out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out.reshape(B, H, W, Cout)


def window_ok(offset, mask, kernel_size=3, padding=1, deformable_groups=8,
              radius=6, H=None, W=None):
    """True iff every bilinear corner with non-zero folded weight lies inside
    the displacement window — the exactness predicate for the Pallas path."""
    B = offset.shape[0]
    H = H if H is not None else offset.shape[1]
    W = W if W is not None else offset.shape[2]
    ry, rx, fy, fx, vy0, vy1, vx0, vx1 = _geometry(
        offset, H, W, kernel_size, padding)
    m = (jnp.ones_like(fy) if mask is None
         else mask.astype(jnp.float32).reshape(ry.shape))
    wy0 = (1 - fy) * vy0 * m
    wy1 = fy * vy1 * m
    wx0 = (1 - fx) * vx0
    wx1 = fx * vx1
    Ru, Rv = parse_radius(radius)
    # Two-sided bounds per corner: the kernel accumulates corner 0 only at
    # displacements u == ry with u in [-Ru, Ru] and corner 1 only at
    # u == ry + 1 in the same range, so each corner must lie fully inside the
    # window unless its folded weight is zero (an out-of-window corner with
    # nonzero weight would be silently dropped — e.g. exactly-integer offsets
    # put all weight on corner 0 while corner 1 sits one past the window).
    oky = ((((ry >= -Ru) & (ry <= Ru)) | (wy0 == 0)) &
           (((ry + 1 >= -Ru) & (ry + 1 <= Ru)) | (wy1 == 0)))
    okx = ((((rx >= -Rv) & (rx <= Rv)) | (wx0 == 0)) &
           (((rx + 1 >= -Rv) & (rx + 1 <= Rv)) | (wx1 == 0)))
    return jnp.all(oky & okx)


def window_needed_radius(offset, mask, kernel_size=3, padding=1,
                         deformable_groups=8, H=None, W=None):
    """Smallest (Ry, Rx) for which `window_ok` holds, as an int32 [2] vector
    (window_ok uses one symmetric radius = the max of the two; the kernel
    itself supports Ru != Rv, so per-axis sizing is available if a trained
    model's flows turn out anisotropic).

    Same geometry and zero-weight exemptions as `window_ok`: a corner only
    constrains R when its folded bilinear weight is non-zero. Pure jnp (no
    Pallas), so it runs on any backend — `scripts/radius_sweep.py --offline`
    uses it to size the serving window for a trained checkpoint on CPU while
    the TPU is busy."""
    H = H if H is not None else offset.shape[1]
    W = W if W is not None else offset.shape[2]
    ry, rx, fy, fx, vy0, vy1, vx0, vx1 = _geometry(
        offset, H, W, kernel_size, padding)
    m = (jnp.ones_like(fy) if mask is None
         else mask.astype(jnp.float32).reshape(ry.shape))
    wy0 = (1 - fy) * vy0 * m
    wy1 = fy * vy1 * m
    wx0 = (1 - fx) * vx0
    wx1 = fx * vx1
    zero = jnp.zeros_like(ry)
    needy = jnp.maximum(jnp.where(wy0 != 0, jnp.abs(ry), zero),
                        jnp.where(wy1 != 0, jnp.abs(ry + 1), zero))
    needx = jnp.maximum(jnp.where(wx0 != 0, jnp.abs(rx), zero),
                        jnp.where(wx1 != 0, jnp.abs(rx + 1), zero))
    return jnp.stack([jnp.max(needy), jnp.max(needx)]).astype(jnp.int32)
