"""Vector-quantization ops (codebook nearest-neighbour search).

Reference semantics: model/codebook.py:19-43. The nearest-code search is an
expanded L2 distance — on TPU this is a single [N, D] x [D, V] MXU matmul plus
row reductions, which XLA fuses; the argmin runs on the VPU."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_code(z_flat: jax.Array, codebook: jax.Array) -> jax.Array:
    """Indices of nearest codebook rows. z_flat [N, D], codebook [V, D]."""
    z2 = jnp.sum(z_flat ** 2, axis=1, keepdims=True)
    e2 = jnp.sum(codebook ** 2, axis=1)
    # HIGHEST: default matmul precision is bf16-multiply (even on the CPU
    # backend here) — distance noise would flip nearest-code argmin ties vs
    # the torch f32 oracle, changing stage-2 CE targets
    ze = jnp.dot(z_flat, codebook.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    d = z2 + e2[None, :] - 2.0 * ze
    return jnp.argmin(d, axis=1)


def quantize(z: jax.Array, codebook: jax.Array, beta: float):
    """Quantize NHWC latents.

    Returns (z_q with straight-through gradient, indices [B*H*W], commit loss).
    Loss = mean((sg(z_q) - z)^2) + beta * mean((z_q - sg(z))^2), codebook.py:26."""
    B, H, W, D = z.shape
    z_flat = z.reshape(-1, D)
    idx = nearest_code(z_flat, codebook)
    z_q = jnp.take(codebook, idx, axis=0).reshape(z.shape)
    loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + \
        beta * jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
    z_q = z + jax.lax.stop_gradient(z_q - z)
    return z_q, idx, loss


def lookup_logits(logits: jax.Array, codebook: jax.Array) -> jax.Array:
    """Top-1 codebook lookup from indexer logits [B, H, W, V] -> [B, H, W, D].

    Matches `Codebook.inference_lr` (codebook.py:34-43): softmax + top-1, which
    reduces to an argmax lookup."""
    if logits.shape[-1] != codebook.shape[0]:
        # out-of-range take would silently fill NaN (jnp.take default mode)
        raise ValueError(
            f"indexer num_classes ({logits.shape[-1]}) != codebook size "
            f"({codebook.shape[0]}) — IndexerConfig.num_classes must match "
            f"CodebookConfig.num_codebook_vectors")
    idx = jnp.argmax(logits, axis=-1)
    return jnp.take(codebook, idx, axis=0)
