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
                       defer_guards: bool = False,
                       guard_mode: str | None = None) -> np.ndarray:
    """Streaming z-stack SR: per-frame features (front trunk + prior bank +
    VGG mask + alignment pyramid — the dominant ~60% of the forward) are
    computed once per SLICE and reused by every window containing it; only
    the window-level alignment/fusion/upsampling runs per output section.
    Identical outputs to the per-window path (the reference recomputes
    per-frame work 5x).

    guard_mode selects how the windowed-kernel exactness guards run:
      * "host" (default): kernels run straight-line with NO lax.cond; the
        collected predicate comes back with the outputs (fetched per section
        anyway) and a miss re-dispatches that section through the exact
        gather path (ops/guard.py::with_host_guards). Identical outputs for
        arbitrary flows/offsets, and it enables the one-deep dispatch-ahead
        pipeline below (device computes section z+1 while the host fetches
        + encodes section z).
      * "defer": one whole-forward lax.cond (with_deferred_guards).
      * "percall": a lax.cond at every windowed dispatch.
    Measured device throughput differs ≤2% (x16) / ≤6% (x8) between modes
    (docs/STATUS.md r4); defer_guards=True is back-compat for "defer"."""
    import jax

    from gpemsr_tpu.ops import guard

    if guard_mode is None:
        guard_mode = "defer" if defer_guards else "host"
    assert guard_mode in ("host", "defer", "percall"), guard_mode

    Z = lr_stack.shape[0]
    stack_dev = jnp.asarray(lr_stack)

    def window(feats, lq):           # name feeds the compile-cache key
        sr, _ = model.apply(params, lq, frame_feats=feats)
        return sr

    @jax.jit
    def frame_feats(frame):          # [h, w, 1] -> per-frame pyramid
        return model.apply(params, frame[None, None], features_only=True)

    window_exact = None
    if guard_mode == "host":
        window_exact = jax.jit(guard.with_forced_exact(window))
        window = jax.jit(guard.with_host_guards(window))
    elif guard_mode == "defer":
        window = jax.jit(guard.with_deferred_guards(window))
    else:
        window = jax.jit(window)

    per_slice = [frame_feats(stack_dev[z]) for z in range(Z)]

    outs = []
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    def finalize(pend):
        """Fetch + PNG-encode one dispatched window (host side)."""
        z, sr, ok = pend
        if ok is not None and not bool(ok):   # rare: out-of-window flow
            idxs = window_indices(z, Z, n_frames)
            feats = tuple(
                None if per_slice[0][k] is None else
                jnp.concatenate([per_slice[i][k] for i in idxs], axis=1)
                for k in range(4))
            lq = jnp.take(stack_dev, jnp.asarray(idxs), axis=0)[None]
            sr = window_exact(feats, lq)
        img = tensor2img(np.asarray(sr[0]))
        outs.append(img)
        if out_dir:
            save_img(img, os.path.join(out_dir, f"{z}.png"))

    # one-deep dispatch-ahead pipeline: section z+1 is enqueued before
    # section z is fetched, so the device computes while the host blocks on
    # the relay transfer + PNG encode (jax dispatch is async; outputs are
    # identical to the serial loop)
    pending = None
    for z in range(Z):
        idxs = window_indices(z, Z, n_frames)
        feats = tuple(
            None if per_slice[0][k] is None else
            jnp.concatenate([per_slice[i][k] for i in idxs], axis=1)
            for k in range(4))
        lq = jnp.take(stack_dev, jnp.asarray(idxs), axis=0)[None]
        if guard_mode == "host":
            sr, ok = window(feats, lq)      # sr [1, H, W, 1], ok scalar
        else:
            sr, ok = window(feats, lq), None
        if pending is not None:
            finalize(pending)
        pending = (z, sr, ok)
    finalize(pending)
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
