"""Modulated deformable convolution v2 (DCNv2) for TPU.

The reference's only custom CUDA kernel: `DCNv2Pack` (basicsr), instantiated 4x
inside POD alignment (model/GPEMSR.py:79,83,88,94) with kernel 3, stride 1,
pad 1, deformable_groups=8. On TPU we decompose it into
  (1) one fused gather of the 4 bilinear corners for all taps/groups, and
  (2) a single [B*H*W, K*Cin] x [K*Cin, Cout] matmul that runs on the MXU.
The gather is the only irregular part; everything else is dense MXU work, which
is exactly the shape XLA schedules well. Semantics follow torchvision's
`deform_conv2d` / basicsr's modulated_deform_conv:
  sample(h, w, g, k) = bilinear(x[..., group g], h - pad + ki + dy, w - pad + kj + dx)
  out = conv(sample * sigmoid_mask)
with zero padding outside the image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def deform_conv2d(x: jax.Array, offset: jax.Array, mask: jax.Array | None,
                  weight: jax.Array, bias: jax.Array | None = None,
                  kernel_size: int = 3, padding: int = 1,
                  deformable_groups: int = 8) -> jax.Array:
    """NHWC modulated deformable conv, stride 1, dilation 1.

    Args:
      x:      [B, H, W, Cin]
      offset: [B, H, W, 2*G*K] — interleaved (dy, dx) per (g, k), torch layout
              offset[..., 2*(g*K+k)] = dy, offset[..., 2*(g*K+k)+1] = dx.
      mask:   [B, H, W, G*K] modulation (already sigmoid-activated), or None.
      weight: [K, Cin, Cout] with K taps ordered row-major (ki*kw+kj).
      bias:   [Cout] or None.
    """
    B, H, W, Cin = x.shape
    K = kernel_size * kernel_size
    G = deformable_groups
    Cg = Cin // G

    off = offset.reshape(B, H, W, G, K, 2)
    dy = off[..., 0]
    dx = off[..., 1]

    ki = jnp.arange(kernel_size, dtype=x.dtype)
    taps_y = jnp.repeat(ki, kernel_size)       # [K] row-major
    taps_x = jnp.tile(ki, kernel_size)
    gy = jnp.arange(H, dtype=x.dtype)
    gx = jnp.arange(W, dtype=x.dtype)

    # absolute sample positions [B, H, W, G, K]
    py = gy[None, :, None, None, None] - padding + taps_y[None, None, None, None, :] + dy
    px = gx[None, None, :, None, None] - padding + taps_x[None, None, None, None, :] + dx

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = py - y0
    fx = px - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    xg = x.reshape(B, H * W, G, Cg)

    # reorder position tensors to [B, HW, K, G] so the gather index varies
    # fastest over taps, then groups
    def prep(t):
        return t.reshape(B, H * W, G, K).transpose(0, 1, 3, 2)

    y0p, x0p, fyp, fxp = prep(y0i), prep(x0i), prep(fy), prep(fx)

    def gather(yy, xx):
        valid = (yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1)
        yc = jnp.clip(yy, 0, H - 1)
        xc = jnp.clip(xx, 0, W - 1)
        idx = (yc * W + xc).reshape(B, H * W * K, G, 1)
        g = jnp.take_along_axis(xg, idx, axis=1)           # [B, HW*K, G, Cg]
        return g.reshape(B, H * W, K, G, Cg), valid.astype(x.dtype)

    v00, m00 = gather(y0p, x0p)
    v01, m01 = gather(y0p, x0p + 1)
    v10, m10 = gather(y0p + 1, x0p)
    v11, m11 = gather(y0p + 1, x0p + 1)

    w00 = ((1 - fyp) * (1 - fxp) * m00)[..., None]
    w01 = ((1 - fyp) * fxp * m01)[..., None]
    w10 = (fyp * (1 - fxp) * m10)[..., None]
    w11 = (fyp * fxp * m11)[..., None]

    samp = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11   # [B, HW, K, G, Cg]

    if mask is not None:
        m = mask.reshape(B, H * W, G, K).transpose(0, 1, 3, 2)[..., None]
        samp = samp * m

    samp = samp.reshape(B, H * W, K * Cin)
    wmat = weight.reshape(K * Cin, -1)
    out = jnp.einsum("bpk,ko->bpo", samp, wmat,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out.reshape(B, H, W, -1)


def torch_weight_to_dcn(w_torch) -> jnp.ndarray:
    """Convert torch deform-conv weight [Cout, Cin, kh, kw] -> [K, Cin, Cout]."""
    w = jnp.asarray(w_torch)
    co, ci, kh, kw = w.shape
    return w.transpose(2, 3, 1, 0).reshape(kh * kw, ci, co)
