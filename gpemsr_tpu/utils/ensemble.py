"""Flip self-ensemble (reference util/util.py:223-245 `flipx4_forward`):
average the model output over 4 flip configurations of the input."""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def flipx4_forward(apply_fn: Callable, lq: jnp.ndarray) -> jnp.ndarray:
    """lq: [..., H, W, C]; apply_fn returns an image-like [..., H', W', C].

    Averages over identity, W-flip, H-flip, HW-flip (flip applied to both the
    input and, inversely, the output)."""
    out = apply_fn(lq)
    o2 = apply_fn(lq[..., :, ::-1, :])[..., :, ::-1, :]
    o3 = apply_fn(lq[..., ::-1, :, :])[..., ::-1, :, :]
    o4 = apply_fn(lq[..., ::-1, ::-1, :])[..., ::-1, ::-1, :]
    return (out + o2 + o3 + o4) / 4.0
