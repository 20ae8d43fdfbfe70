"""SR inference over a z-stack (reference output_GPEMSR.py:18-129).

Slides a 5-frame window along z with edge replication (the reference's
explicit first/last-frame padding is exactly index clamping), runs the jitted
GPEMSR forward per window, and returns/writes uint8 sections. The model is
compiled once for the window shape; frames stay on device between windows."""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from gpemsr_tpu.utils.image import save_img, tensor2img


def window_indices(z: int, num_z: int, n_frames: int = 5) -> list[int]:
    half = n_frames // 2
    return [min(max(z + o, 0), num_z - 1) for o in range(-half, half + 1)]


def sr_stack_streaming(model, params, lr_stack: np.ndarray, n_frames: int = 5,
                       out_dir: str | None = None,
                       defer_guards: bool = False) -> np.ndarray:
    """Streaming z-stack SR: per-frame features (front trunk + prior bank +
    VGG mask + alignment pyramid — the dominant ~60% of the forward) are
    computed once per SLICE and reused by every window containing it; only
    the window-level alignment/fusion/upsampling runs per output section.
    Identical outputs to the per-window path (the reference recomputes
    per-frame work 5x).

    defer_guards=True hoists the per-op windowed-kernel exactness conds into
    one whole-forward cond (ops/guard.py) — same outputs, fewer fusion
    barriers on TPU."""
    import jax

    from gpemsr_tpu.ops import guard

    Z = lr_stack.shape[0]
    stack_dev = jnp.asarray(lr_stack)

    def window(feats, lq):           # name feeds the compile-cache key
        sr, _ = model.apply(params, lq, frame_feats=feats)
        return sr

    @jax.jit
    def frame_feats(frame):          # [h, w, 1] -> per-frame pyramid
        return model.apply(params, frame[None, None], features_only=True)

    window = jax.jit(guard.with_deferred_guards(window)
                     if defer_guards else window)

    per_slice = [frame_feats(stack_dev[z]) for z in range(Z)]

    outs = []
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    for z in range(Z):
        idxs = window_indices(z, Z, n_frames)
        feats = tuple(
            None if per_slice[0][k] is None else
            jnp.concatenate([per_slice[i][k] for i in idxs], axis=1)
            for k in range(4))
        lq = jnp.take(stack_dev, jnp.asarray(idxs), axis=0)[None]
        img = tensor2img(np.asarray(window(feats, lq)[0]))
        outs.append(img)
        if out_dir:
            save_img(img, os.path.join(out_dir, f"{z}.png"))
    return np.stack(outs, 0)


def sr_stack(apply_fn: Callable, lr_stack: np.ndarray, n_frames: int = 5,
             out_dir: str | None = None) -> np.ndarray:
    """lr_stack [Z, h, w, 1] float32 in [0,1] -> uint8 SR stack [Z, H, W].

    apply_fn(lq[1, N, h, w, 1]) -> (sr, ref) — typically
    `jax.jit(lambda lq: model.apply({'params': params}, lq))`."""
    Z = lr_stack.shape[0]
    stack_dev = jnp.asarray(lr_stack)
    outs = []
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    for z in range(Z):
        idx = jnp.asarray(window_indices(z, Z, n_frames))
        lq = jnp.take(stack_dev, idx, axis=0)[None]     # [1, N, h, w, 1]
        sr, _ = apply_fn(lq)
        img = tensor2img(np.asarray(sr[0]))
        outs.append(img)
        if out_dir:
            save_img(img, os.path.join(out_dir, f"{z}.png"))
    return np.stack(outs, 0)
