"""Contextual (CX / CoBi) loss distance machinery.

Reference: model/contextual.py. The distance step builds an (H*W) x (H*W)
matrix at VGG relu3_4 resolution — the most memory-hungry op of stage 3. Here
the pairwise matrix is one MXU matmul (64x64 latent grid -> 4096^2 matrix,
~64MB fp32, fine in HBM; XLA keeps the reductions fused).

All three reference distance types are provided (contextual.py:115-172),
including two faithful quirk reproductions:
  * L2 (contextual.py:141-154): after the transpose dance the matrix is
    dist[i,j] = ||x_i||^2 + ||y_i||^2 - 2*x_i.y_j — the reference broadcasts
    y's squared norms over the wrong axis. Preserved bit-for-bit.
  * L1 (contextual.py:157-171): `y` is never read — the distance compares
    channel-sums of x against themselves: |sum_c x_j - sum_c x_i|. Preserved.
The bilateral (CoBi) variant adds the spatial-grid term of
contextual.py:67-100 with meshgrid rows/(H+1), cols/(W+1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOSS_TYPES = ("cosine", "L1", "L2")


def compute_cosine_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    """Cosine distance matrix (contextual.py:115-138). x, y: [N, C, L].
    Mean-shift by y's channel mean, channel-wise L2 normalize, 1 - x^T y."""
    y_mu = jnp.mean(y, axis=(0, 2), keepdims=True)
    xc = x - y_mu
    yc = y - y_mu
    xn = xc / (jnp.linalg.norm(xc, axis=1, keepdims=True) + 1e-12)
    yn = yc / (jnp.linalg.norm(yc, axis=1, keepdims=True) + 1e-12)
    sim = jnp.einsum("nci,ncj->nij", xn, yn, preferred_element_type=jnp.float32)
    return jnp.clip(1.0 - sim, 0.0, None)


def compute_l2_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    """Reference-exact expanded 'L2' (contextual.py:141-154). x, y: [N, C, L].
    dist[n,i,j] = ||x_i||^2 + ||y_i||^2 - 2 <y_j, x_i>  (quirk preserved:
    the reference broadcasts both squared-norm terms along the row axis)."""
    x_s = jnp.sum(x * x, axis=1)[:, None, :]          # [N, 1, L] over i
    y_s = jnp.sum(y * y, axis=1)[:, None, :]          # [N, 1, L] over i
    a = jnp.einsum("ncj,nci->nji", y, x,
                   preferred_element_type=jnp.float32)  # A[n,j,i] = <y_j, x_i>
    dist = y_s - 2.0 * a + x_s                          # [n, j, i]
    return jnp.clip(dist.transpose(0, 2, 1), 0.0, None)


def compute_l1_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    """Reference-exact 'L1' (contextual.py:157-171). Quirk preserved: `y` is
    unused — dist[n,a,b] = |sum_c x[n,c,b] - sum_c x[n,c,a]|."""
    del y
    s = jnp.sum(x, axis=1)                             # [N, L]
    dist = jnp.abs(s[:, None, :] - s[:, :, None])
    return jnp.clip(dist, 0.0, None)


_DISTANCES = {"cosine": compute_cosine_distance,
              "L2": compute_l2_distance,
              "L1": compute_l1_distance}


def _compute_cx(dist_tilde: jax.Array, band_width: float) -> jax.Array:
    """Eq (3)+(4): similarity w, row-normalized (contextual.py:103-107)."""
    w = jnp.exp((1.0 - dist_tilde) / band_width)
    return w / (jnp.sum(w, axis=2, keepdims=True) + 1e-5)


def _relative_distance(dist_raw: jax.Array) -> jax.Array:
    dist_min = jnp.min(dist_raw, axis=2, keepdims=True)
    return dist_raw / (dist_min + 1e-5)


def _cx_tail(cx_mat: jax.Array, dist_raw: jax.Array, band_width: float):
    """Per-column max + confidence weighting + -log mean
    (contextual.py:46-52). Returns (loss, confidence [N, L])."""
    r_max = jnp.max(cx_mat, axis=1, keepdims=True)             # [N, 1, L]
    r_arg = jnp.argmax(cx_mat, axis=1)                         # [N, L]
    conf_all = jnp.exp((1.0 - dist_raw) / band_width)
    c = jnp.take_along_axis(conf_all, r_arg[:, None, :], axis=1)
    r = jnp.squeeze(r_max * c, 1)
    cw = jnp.squeeze(c, 1)
    cx_val = jnp.sum(r, axis=1) / jnp.sum(cw, axis=1)
    return jnp.mean(-jnp.log(cx_val + 1e-5)), cw


def contextual_loss(x: jax.Array, y: jax.Array, band_width: float = 0.5,
                    loss_type: str = "cosine") -> jax.Array:
    """Contextual loss between feature maps x, y: [N, C, H, W]
    (contextual.py:8-52)."""
    assert loss_type in LOSS_TYPES, f"select a loss type from {LOSS_TYPES}"
    N, C, H, W = x.shape
    dist_raw = _DISTANCES[loss_type](x.reshape(N, C, -1), y.reshape(N, C, -1))
    cx_mat = _compute_cx(_relative_distance(dist_raw), band_width)
    loss, _ = _cx_tail(cx_mat, dist_raw, band_width)
    return loss


def contextual_bilateral_loss(x: jax.Array, y: jax.Array,
                              weight_sp: float = 0.1,
                              band_width: float = 0.5,
                              loss_type: str = "cosine") -> jax.Array:
    """CoBi: blend feature CX with a spatial-grid CX (contextual.py:67-100).
    The spatial term uses the reference's meshgrid normalisation
    rows/(H+1), cols/(W+1) and its (quirky) expanded-L2 distance."""
    assert loss_type in LOSS_TYPES, f"select a loss type from {LOSS_TYPES}"
    N, C, H, W = x.shape

    rows = jnp.arange(H, dtype=jnp.float32) / (H + 1)
    cols = jnp.arange(W, dtype=jnp.float32) / (W + 1)
    gr, gc = jnp.meshgrid(rows, cols, indexing="ij")
    grid = jnp.stack([gr, gc])[None]                    # [1, 2, H, W]
    grid = jnp.broadcast_to(grid, (N, 2, H, W)).reshape(N, 2, -1)
    dist_sp = compute_l2_distance(grid, grid)
    cx_sp = _compute_cx(_relative_distance(dist_sp), band_width)

    dist_raw = _DISTANCES[loss_type](x.reshape(N, C, -1), y.reshape(N, C, -1))
    cx_feat = _compute_cx(_relative_distance(dist_raw), band_width)

    cx_mat = (1.0 - weight_sp) * cx_feat + weight_sp * cx_sp
    loss, _ = _cx_tail(cx_mat, dist_raw, band_width)
    return loss
