"""Contextual (CX) loss distance machinery.

Reference: model/contextual.py. The cosine-distance variant builds an
(H*W) x (H*W) matrix at VGG relu3_4 resolution — the most memory-hungry op of
stage 3. Here the pairwise matrix is one MXU matmul (64x64 latent grid ->
4096^2 matrix, ~64MB fp32, fine in HBM; XLA keeps the reductions fused)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize_features(x: jax.Array, y: jax.Array):
    """Mean-shift by y's channel mean + channel-wise L2 normalization
    (contextual.py:117-126). x, y: [N, C, L]."""
    y_mu = jnp.mean(y, axis=(0, 2), keepdims=True)
    xc = x - y_mu
    yc = y - y_mu
    xn = xc / (jnp.linalg.norm(xc, axis=1, keepdims=True) + 1e-12)
    yn = yc / (jnp.linalg.norm(yc, axis=1, keepdims=True) + 1e-12)
    return xn, yn


def contextual_loss(x: jax.Array, y: jax.Array, band_width: float = 0.5) -> jax.Array:
    """Cosine-type contextual loss between feature maps x, y: [N, C, H, W].

    Implements contextual.py:34-52: relative distance, exp similarity,
    per-row max with confidence weighting, -log mean."""
    N, C, H, W = x.shape
    xn, yn = _normalize_features(x.reshape(N, C, -1), y.reshape(N, C, -1))

    # dist[n, i, j] = 1 - <x_i, y_j>  (clamped at 0)
    sim = jnp.einsum("nci,ncj->nij", xn, yn, preferred_element_type=jnp.float32)
    dist = jnp.clip(1.0 - sim, 0.0, None)

    dist_min = jnp.min(dist, axis=2, keepdims=True)
    dist_tilde = dist / (dist_min + 1e-5)
    w = jnp.exp((1.0 - dist_tilde) / band_width)
    cx = w / (jnp.sum(w, axis=2, keepdims=True) + 1e-5)

    r_max = jnp.max(cx, axis=1, keepdims=True)                 # [N, 1, L]
    r_arg = jnp.argmax(cx, axis=1)                             # [N, L]
    conf_all = jnp.exp((1.0 - dist) / band_width)
    c = jnp.take_along_axis(conf_all, r_arg[:, None, :], axis=1)  # [N, 1, L]

    r = jnp.squeeze(r_max * c, 1)
    cw = jnp.squeeze(c, 1)
    cx_val = jnp.sum(r, axis=1) / jnp.sum(cw, axis=1)
    return jnp.mean(-jnp.log(cx_val + 1e-5))
