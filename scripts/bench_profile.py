"""Real-device timing of the flagship x16 full-section inference path.

The axon relay's dispatch/fetch overhead (~30 ms) buried the true device
time in the round-1 bench (BENCH_r01: 8.9 MPix/s measured with per-dispatch
timing). Here every segment is chained data-dependently N times inside one
jit and fetched once, so the number is pure device time.

Segments:
  feats   — per-frame features (front trunk + prior bank + VGG mask + pyramid)
  window  — window-level POD align + fusion + upsample from cached features
  stream  — feats + window = steady-state cost per output section (streaming)
  full    — whole 5-frame window forward (the reference's per-window cost)

Usage: python scripts/bench_profile.py [--f32] [--iters=N] [--x8]
         [--window-radius=R] [--coarse-radius=R] [--dense-threshold=T]
(the kernel-tuning flags apply to the --x8 config only)
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _bench_util import timed_chain  # noqa: E402
from __graft_entry__ import _flagship_cfg
from gpemsr_tpu.models.gpemsr import GPEMSR
from gpemsr_tpu.utils.precision import bf16_inference


def main():
    use_bf16 = "--f32" not in sys.argv
    iters = 4
    for a in sys.argv[1:]:
        if a.startswith("--iters="):
            iters = int(a.split("=")[1])

    scale = 8 if "--x8" in sys.argv else 16
    if scale == 8:
        import dataclasses

        from gpemsr_tpu.core.config import GPEMSRConfig, PriorConfig

        def _radius(a):
            v = a.split("=")[1]
            return (tuple(int(r) for r in v.split(","))
                    if "," in v else int(v))

        # probed trained-x8-checkpoint serving radii — match bench.py
        cfg = GPEMSRConfig(scale=8, prior=PriorConfig(scale=8),
                           dcn_window_radius=3,
                           dcn_coarse_window_radius=3,
                           dcn_cascade_window_radius=(7, 5))
        for a in sys.argv[1:]:
            if a.startswith("--window-radius="):
                cfg = dataclasses.replace(cfg, dcn_window_radius=_radius(a))
            if a.startswith("--coarse-radius="):
                cfg = dataclasses.replace(
                    cfg, dcn_coarse_window_radius=_radius(a))
            if a.startswith("--cascade-radius="):
                cfg = dataclasses.replace(
                    cfg, dcn_cascade_window_radius=_radius(a))
            if a.startswith("--dense-threshold="):
                cfg = dataclasses.replace(
                    cfg, dcn_dense_threshold=int(a.split("=")[1]))
    else:
        cfg = _flagship_cfg()
    model = GPEMSR(cfg)
    h = w = 1024 // scale
    lq0 = jnp.zeros((1, 5, 16, 16, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), lq0)

    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(0, 1, (1, 5, h, w, 1)).astype(np.float32))
    frame0 = lq[0, 0]

    if use_bf16:
        feats_raw = bf16_inference(
            lambda p, f: model.apply(p, f[None, None], features_only=True),
            params)
        win_raw = bf16_inference(
            lambda p, ft, x: model.apply(p, x, frame_feats=ft)[0], params)
        full_raw = bf16_inference(lambda p, x: model.apply(p, x)[0], params)
        feats_fn = lambda f: feats_raw(f)            # noqa: E731
        win_fn = lambda ft, x: win_raw(ft, x)        # noqa: E731
        full_fn = lambda x: full_raw(x)              # noqa: E731
    else:
        feats_fn = lambda f: model.apply(            # noqa: E731
            params, f[None, None], features_only=True)
        win_fn = lambda ft, x: model.apply(          # noqa: E731
            params, x, frame_feats=ft)[0]
        full_fn = lambda x: model.apply(params, x)[0]  # noqa: E731

    oh = timed_chain(lambda c: c + 1.0, jnp.ones((8, 128), jnp.float32),
                     iters=iters)
    print(f"overhead: {oh*1e3:8.2f} ms   (iters={iters}, "
          f"{'bf16' if use_bf16 else 'f32'})")

    def dep(c):  # scalar perturbation carrying a data dependency
        return 1e-6 * c.astype(jnp.float32).mean()

    # feats: frame -> frame chained via SR of a dummy? chain on frame itself
    f1 = jax.jit(lambda f: feats_fn(f))(frame0)

    def feats_step(c):
        f = feats_fn(frame0 + dep(c))
        return f[0]  # first pyramid level as carry

    t = (timed_chain(feats_step, jnp.zeros_like(f1[0]),
                     iters=iters) - oh) / iters
    print(f"feats : {t*1e3:8.2f} ms/frame")
    t_feats = t

    # window: from a cached feature tuple
    feats_tuple = tuple(None if t_ is None else jnp.concatenate([t_] * 5, axis=1)
                        for t_ in f1)

    def win_step(c):
        ft = tuple(None if t_ is None else t_ + dep(c).astype(t_.dtype)
                   for t_ in feats_tuple)
        return win_fn(ft, lq)

    t = (timed_chain(win_step, jnp.zeros((1, h * scale, w * scale, 1), jnp.float32),
                     iters=iters) - oh) / iters
    print(f"window: {t*1e3:8.2f} ms/section")
    t_win = t

    stream = t_feats + t_win
    print(f"stream: {stream*1e3:8.2f} ms/section -> "
          f"{(h*scale)*(w*scale)/1e6/stream:6.2f} MPix/s")

    def full_step(c):
        return full_fn(lq + dep(c))

    t = (timed_chain(full_step, jnp.zeros((1, h * scale, w * scale, 1), jnp.float32),
                     iters=iters) - oh) / iters
    print(f"full  : {t*1e3:8.2f} ms/window -> {(h*scale)*(w*scale)/1e6/t:6.2f} MPix/s")


if __name__ == "__main__":
    main()
