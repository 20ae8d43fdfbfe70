"""Modulated deformable convolution v2 (DCNv2) for TPU.

The reference's only custom CUDA kernel: `DCNv2Pack` (basicsr), instantiated 4x
inside POD alignment (model/GPEMSR.py:79,83,88,94) with kernel 3, stride 1,
pad 1, deformable_groups=8. On TPU we decompose it into
  (1) ONE `lax.gather` per sample fetching the whole 2x2xCg bilinear corner
      block (profiling showed four narrow 8-wide gathers ran at ~6 GB/s and
      dominated the forward pass; one 2x2xCg slab quadruples the gather width
      and quarters the gather count), and
  (2) a single [B*H*W, K*Cin] x [K*Cin, Cout] matmul that runs on the MXU.
Semantics follow torchvision's `deform_conv2d` / basicsr's
modulated_deform_conv:
  sample(h, w, g, k) = bilinear(x[..., group g], h - pad + ki + dy, w - pad + kj + dx)
  out = conv(sample * sigmoid_mask)
with zero padding outside the image. Coordinate math stays f32 (absolute
positions lose fractional precision in bf16)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# Padded-HBM budget (MB) above which the slab-gather fallback runs in
# whole-row chunks (see _deform_conv2d_xla). Patchable in tests.
_CHUNK_BUDGET_MB = 384


def deform_conv2d(x: jax.Array, offset: jax.Array, mask: jax.Array | None,
                  weight: jax.Array, bias: jax.Array | None = None,
                  kernel_size: int = 3, padding: int = 1,
                  deformable_groups: int = 8,
                  dense_threshold: int = 1024,
                  window_radius: int | tuple = 0,
                  conv_precision=None,
                  sample_dtype=None) -> jax.Array:
    """NHWC modulated deformable conv, stride 1, dilation 1.

    Args:
      x:      [B, H, W, Cin]
      offset: [B, H, W, 2*G*K] — interleaved (dy, dx) per (g, k), torch layout
              offset[..., 2*(g*K+k)] = dy, offset[..., 2*(g*K+k)+1] = dx.
      mask:   [B, H, W, G*K] modulation (already sigmoid-activated), or None.
      weight: [K, Cin, Cout] with K taps ordered row-major (ki*kw+kj).
      bias:   [Cout] or None.
      dense_threshold: maps with H*W at or below this take the dense one-hot
          MXU path (matmul backward — training scales); larger maps take the
          Pallas windowed kernel (if window_radius > 0, TPU only) or the
          slab-gather path.
      window_radius: displacement window radius for the Pallas kernel
          (ops/dcn_pallas.py) — an int (symmetric) or (Ry, Rx) for an
          anisotropic window (dcn_pallas.parse_radius). 0 disables (XLA
          dense/slab crossover by dense_threshold). -1 forces the dense
          one-hot path regardless of dense_threshold: exact with no guard,
          and the right crossover for mid-size maps whose trained offsets
          overflow any cheap window (the x8 cascade probes at (7,5) = 165
          shifts ~ 15 ms at 64^2 maps vs dense 13.7 ms). When
          enabled, a cheap predicate
          `lax.cond`s every call to the exact gather path whenever any
          non-zero bilinear corner falls outside the window, so semantics
          stay exact for arbitrary offsets. Differentiable: the backward pass
          re-linearizes through the gather formulation (custom_vjp below),
          since pallas_call has no transpose rule.
      sample_dtype: dtype the Pallas kernel stores the feature map in. None
          (default) means x.dtype — storing the input's own values is
          LOSSLESS (the corner blend always accumulates in f32, matching
          the gather path's f32 HIGHEST blend of the same values), and for
          bf16 models halves the kernel's VMEM footprint. Pass an explicit
          dtype only to override (e.g. jnp.float32 to upcast bf16 inputs,
          which adds nothing numerically).
    """
    B, H, W, Cin = x.shape
    if isinstance(window_radius, (tuple, list)):
        window_radius = tuple(int(r) for r in window_radius)  # hashable
        r_min = min(window_radius)
    else:
        r_min = window_radius
    if r_min == -1:
        dense_threshold = H * W      # force the dense one-hot path
    if r_min > 0 and H * W > dense_threshold:
        from gpemsr_tpu.ops import dcn_pallas, guard
        if guard.probing():
            # radius-probe mode (guard.with_radius_probe): record the minimum
            # window radius these operands require, compute via the exact
            # gather path — backend-agnostic, used to size the serving window
            # for a trained checkpoint without occupying the TPU.
            guard.record_needed(dcn_pallas.window_needed_radius(
                offset, mask, kernel_size=kernel_size, padding=padding,
                deformable_groups=deformable_groups, H=H, W=W))
        elif ((jax.default_backend() == "tpu" or dcn_pallas.INTERPRET)
                and not guard.forcing_exact()):
            sd = x.dtype if sample_dtype is None else sample_dtype
            if guard.deferring():
                # deferred-guard inference (ops/guard.py): run the windowed
                # kernel unconditionally, record the exactness predicate; the
                # caller's single lax.cond recomputes everything exactly on a
                # miss. Bypasses the custom_vjp — inference only.
                guard.record(dcn_pallas.window_ok(
                    offset, mask, kernel_size=kernel_size, padding=padding,
                    deformable_groups=deformable_groups,
                    radius=window_radius, H=H, W=W))
                out = dcn_pallas.deform_conv2d_windowed(
                    x, offset, mask, weight, bias, kernel_size=kernel_size,
                    padding=padding, deformable_groups=deformable_groups,
                    radius=window_radius, sample_dtype=sd)
                return out
            return _deform_conv2d_windowed_guarded(
                kernel_size, padding, deformable_groups, window_radius,
                conv_precision, sd, x, offset, mask, weight, bias)
    return _deform_conv2d_xla(
        x, offset, mask, weight, bias, kernel_size=kernel_size,
        padding=padding, deformable_groups=deformable_groups,
        dense_threshold=dense_threshold, conv_precision=conv_precision)


def _guarded_impl(kernel_size, padding, deformable_groups, window_radius,
                  conv_precision, sample_dtype, x, offset, mask, weight, bias):
    from gpemsr_tpu.ops.dcn_pallas import deform_conv2d_windowed, window_ok

    B, H, W, Cin = x.shape

    def _windowed(ops):
        xx, oo, mm, ww, bb = ops
        return deform_conv2d_windowed(
            xx, oo, mm, ww, bb, kernel_size=kernel_size, padding=padding,
            deformable_groups=deformable_groups, radius=window_radius,
            sample_dtype=sample_dtype)

    def _gather(ops):
        xx, oo, mm, ww, bb = ops
        return _deform_conv2d_xla(
            xx, oo, mm, ww, bb, kernel_size=kernel_size, padding=padding,
            deformable_groups=deformable_groups, dense_threshold=0,
            conv_precision=conv_precision)

    ok = window_ok(offset, mask, kernel_size=kernel_size, padding=padding,
                   deformable_groups=deformable_groups,
                   radius=window_radius, H=H, W=W)
    return lax.cond(ok, _windowed, _gather,
                    (x, offset, mask, weight, bias))


# pallas_call has no transpose rule, so jax.grad through the windowed forward
# would fail loudly. Forward runs the guarded Pallas dispatch; backward
# re-linearizes through the XLA slab-gather formulation at the same primals
# (numerically the same function wherever the guard admits the kernel).
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _deform_conv2d_windowed_guarded(kernel_size, padding, deformable_groups,
                                    window_radius, conv_precision,
                                    sample_dtype, x, offset, mask, weight,
                                    bias):
    return _guarded_impl(kernel_size, padding, deformable_groups,
                         window_radius, conv_precision, sample_dtype,
                         x, offset, mask, weight, bias)


def _guarded_fwd(kernel_size, padding, deformable_groups, window_radius,
                 conv_precision, sample_dtype, x, offset, mask, weight, bias):
    out = _guarded_impl(kernel_size, padding, deformable_groups,
                        window_radius, conv_precision, sample_dtype,
                        x, offset, mask, weight, bias)
    return out, (x, offset, mask, weight, bias)


def _guarded_bwd(kernel_size, padding, deformable_groups, window_radius,
                 conv_precision, sample_dtype, res, g):
    x, offset, mask, weight, bias = res

    def f(xx, oo, mm, ww, bb):
        return _deform_conv2d_xla(
            xx, oo, mm, ww, bb, kernel_size=kernel_size, padding=padding,
            deformable_groups=deformable_groups, dense_threshold=0,
            conv_precision=conv_precision)

    _, vjp = jax.vjp(f, x, offset, mask, weight, bias)
    return vjp(g)


_deform_conv2d_windowed_guarded.defvjp(_guarded_fwd, _guarded_bwd)


def _deform_conv2d_xla(x: jax.Array, offset: jax.Array, mask: jax.Array | None,
                       weight: jax.Array, bias: jax.Array | None = None,
                       kernel_size: int = 3, padding: int = 1,
                       deformable_groups: int = 8,
                       dense_threshold: int = 1024,
                       conv_precision=None) -> jax.Array:
    """Pure-XLA DCNv2: dense one-hot MXU path (small maps) or slab-gather."""
    B, H, W, Cin = x.shape
    K = kernel_size * kernel_size
    G = deformable_groups
    Cg = Cin // G

    off = offset.astype(jnp.float32).reshape(B, H, W, G, K, 2)
    dy = off[..., 0]
    dx = off[..., 1]

    ki = jnp.arange(kernel_size, dtype=jnp.float32)
    taps_y = jnp.repeat(ki, kernel_size)       # [K] row-major
    taps_x = jnp.tile(ki, kernel_size)
    gy = jnp.arange(H, dtype=jnp.float32)
    gx = jnp.arange(W, dtype=jnp.float32)

    # absolute sample positions [B, H, W, G, K]
    py = gy[None, :, None, None, None] - padding + taps_y[None, None, None, None, :] + dy
    px = gx[None, None, :, None, None] - padding + taps_x[None, None, None, None, :] + dx

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = py - y0
    fx = px - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # reorder to [B, HW, K, G] (taps fastest over rows, then groups)
    def prep(t):
        return t.reshape(B, H * W, G, K).transpose(0, 1, 3, 2)

    y0p, x0p, fyp, fxp = prep(y0i), prep(x0i), prep(fy), prep(fx)

    if H * W <= dense_threshold:
        # Dense one-hot bilinear sampling: samp = W_d @ x with W_d built by
        # index comparison. Both forward and backward are MXU matmuls — the
        # gather formulation's BACKWARD is a scatter-add, which XLA lowers
        # to a serial loop on TPU (profiled at >1s per train step). Used for
        # training-resolution maps; inference-scale maps take the gather path.
        q = jnp.arange(H * W, dtype=jnp.int32)

        def corner(yy, xx, wgt):
            valid = ((yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1))
            idx = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
            onehot = (idx[..., None] == q).astype(x.dtype)
            return onehot * (wgt * valid)[..., None]

        wd = (corner(y0p, x0p, (1 - fyp) * (1 - fxp)) +
              corner(y0p, x0p + 1, (1 - fyp) * fxp) +
              corner(y0p + 1, x0p, fyp * (1 - fxp)) +
              corner(y0p + 1, x0p + 1, fyp * fxp))     # [B, HW, K, G, HW]
        xg = x.reshape(B, H * W, G, Cg)
        # HIGHEST: this matmul IS the bilinear sampling — default precision
        # truncates the corner weights to bf16 (0.4% sample error vs torch)
        samp = jnp.einsum("bpkgq,bqgc->bpkgc", wd, xg,
                          preferred_element_type=jnp.float32,
                          precision=lax.Precision.HIGHEST)
        if mask is not None:
            m = mask.reshape(B, H * W, G, K).transpose(0, 1, 3, 2)[..., None]
            samp = samp * m.astype(samp.dtype)
        samp = samp.reshape(B, H * W, K * Cin).astype(x.dtype)
        wmat = weight.reshape(K * Cin, -1).astype(x.dtype)
        out = jnp.einsum("bpk,ko->bpo", samp, wmat,
                         preferred_element_type=jnp.float32,
                         precision=conv_precision).astype(x.dtype)
        if bias is not None:
            out = out + bias
        return out.reshape(B, H, W, -1)

    mask_t = None
    if mask is not None:
        mask_t = mask.astype(jnp.float32).reshape(B, H * W, G, K)
        mask_t = mask_t.transpose(0, 1, 3, 2)

    xg = x.reshape(B, H, W, G, Cg)
    wmat = weight.reshape(K * Cin, -1).astype(x.dtype)

    def slab_gather(args):
        """Gather + bilinear blend + conv matmul over [B, P, K, G] samples."""
        y0c, x0c, fyc, fxc, mc = args
        P = y0c.shape[1]
        by = jnp.clip(y0c, 0, max(H - 2, 0))
        bx = jnp.clip(x0c, 0, max(W - 2, 0))
        gids = jnp.broadcast_to(
            jnp.arange(G, dtype=jnp.int32)[None, None, None, :], y0c.shape)
        starts = jnp.stack([by, bx, gids], axis=-1).reshape(B, P * K * G, 3)

        dnums = lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4),        # slab dims (y, x, Cg) in the output
            collapsed_slice_dims=(3,),    # the size-1 group slice
            start_index_map=(1, 2, 3),    # (y, x, g)
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        )
        slab = lax.gather(xg, starts, dnums, slice_sizes=(1, 2, 2, 1, Cg),
                          mode=lax.GatherScatterMode.CLIP)
        slab = slab.reshape(B, P, K, G, 2, 2, Cg)

        # per-slab-position bilinear weights: slab rows are (by, by+1); row i
        # is corner y0 (weight (1-fy)) iff by+i == y0, corner y0+1 (weight
        # fy) iff by+i == y0+1, else 0 — validity folded in.
        def axis_w(c0, base, frac, size):
            v0 = ((c0 >= 0) & (c0 <= size - 1)).astype(jnp.float32)
            v1 = ((c0 + 1 >= 0) & (c0 + 1 <= size - 1)).astype(jnp.float32)
            ws = []
            for i in (0, 1):
                ws.append(jnp.where(base + i == c0, (1 - frac) * v0,
                                    jnp.where(base + i == c0 + 1,
                                              frac * v1, 0.0)))
            return ws  # two arrays [B, P, K, G]

        wy = axis_w(y0c, by, fyc, H)
        wx = axis_w(x0c, bx, fxc, W)
        if mc is not None:
            wy = [w * mc for w in wy]              # fold modulation into wy
        wgrid = jnp.stack(
            [jnp.stack([wy[0] * wx[0], wy[0] * wx[1]], axis=-1),
             jnp.stack([wy[1] * wx[0], wy[1] * wx[1]], axis=-1)],
            axis=-2)                               # [B, P, K, G, 2, 2]
        # HIGHEST: the 2x2 corner blend is sampling math, keep exact f32
        samp = jnp.einsum("bpkgij,bpkgijc->bpkgc", wgrid.astype(jnp.float32),
                          slab.astype(jnp.float32),
                          precision=lax.Precision.HIGHEST).astype(x.dtype)
        samp = samp.reshape(B, P, K * Cin)
        return jnp.einsum("bpk,ko->bpo", samp, wmat,
                          preferred_element_type=jnp.float32,
                          precision=conv_precision).astype(x.dtype)

    # The slab's XLA layout pads Cg (8 lanes) to the 128-lane tile — a 16x
    # HBM expansion that reaches 11+ GB for batch-5 128^2 maps, allocated
    # even when the slab branch is the DEAD side of the window-guard
    # lax.cond. Above a padded-temp budget, run the gather over whole-row
    # chunks with lax.map: memory drops to one chunk, and the chunked form
    # only ever executes on guard misses (or explicit window_radius=0 runs
    # at inference scale), where latency is secondary to exactness.
    args = (y0p, x0p, fyp, fxp, mask_t)
    padded_mb = B * H * W * K * G * 4 * 128 * 6 // (1 << 20)
    chunks = 1
    while padded_mb // chunks > _CHUNK_BUDGET_MB and chunks < H:
        chunks *= 2
    while H % chunks:                              # keep whole rows per chunk
        chunks //= 2
    if chunks > 1:
        def to_chunks(t):
            if t is None:
                return None
            t = t.reshape((B, chunks, H * W // chunks) + t.shape[2:])
            return jnp.moveaxis(t, 1, 0)

        mapped = lax.map(slab_gather,
                         tuple(to_chunks(t) for t in args))
        out = jnp.moveaxis(mapped, 0, 1).reshape(B, H * W, -1)
    else:
        out = slab_gather(args)

    if bias is not None:
        out = out + bias
    return out.reshape(B, H, W, -1)


def torch_weight_to_dcn(w_torch) -> jnp.ndarray:
    """Convert torch deform-conv weight [Cout, Cin, kh, kw] -> [K, Cin, Cout]."""
    w = jnp.asarray(w_torch)
    co, ci, kh, kw = w.shape
    return w.transpose(2, 3, 1, 0).reshape(kh * kw, ci, co)
