"""Capture a jax.profiler device trace of the streaming-SR steady state.

Round-2 assumed profiler traces could not be served over the axon relay;
measured round 3: they can — the trace directory gets `vm.xplane.pb` plus a
perfetto `vm.trace.json.gz` whose `/device:TPU:0` lane carries per-op
device timings (sanity check: a 2048^2 bf16 matmul traces at ~103 us
= ~167 TFLOP/s = ~85% of v5e peak). View with `tensorboard --logdir OUT`
or perfetto.dev on the decompressed json.

Usage: python scripts/profile_trace.py [--out DIR] [--matmul-only]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(ROOT, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    out = "/tmp/jaxtrace"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    os.makedirs(out, exist_ok=True)

    if "--matmul-only" in sys.argv:
        x = jnp.ones((2048, 2048), jnp.bfloat16)
        f = jax.jit(lambda a: a @ a)
        _ = f(x).block_until_ready()          # compile outside the trace
        with jax.profiler.trace(out):
            f(x).block_until_ready()
    else:
        from __graft_entry__ import _flagship_cfg
        from gpemsr_tpu.models.gpemsr import GPEMSR
        from gpemsr_tpu.utils.precision import bf16_inference

        if "--x8" in sys.argv:
            from gpemsr_tpu.core.config import GPEMSRConfig, PriorConfig
            # probed trained-x8 serving radii — match bench.py's x8 config
            cfg = GPEMSRConfig(scale=8, prior=PriorConfig(scale=8),
                               dcn_window_radius=3,
                               dcn_coarse_window_radius=3,
                               dcn_cascade_window_radius=(7, 5))
        else:
            cfg = _flagship_cfg()
        model = GPEMSR(cfg)
        h = w = 1024 // cfg.scale
        lq0 = jnp.zeros((1, 5, 16, 16, 1), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), lq0)
        rng = np.random.default_rng(0)
        lq = jnp.asarray(rng.uniform(0, 1, (1, 5, h, w, 1)).astype(np.float32))
        feats_fn = jax.jit(bf16_inference(
            lambda p, f: model.apply(p, f[:, None], features_only=True),
            params))
        win_raw = bf16_inference(
            lambda p, ft, x: model.apply(p, x, frame_feats=ft)[0], params)
        # default: trace the production streaming graph (host guards —
        # straight-line kernels, ok predicate returned); --percall keeps
        # the per-dispatch lax.cond variant for comparison
        if "--percall" in sys.argv:
            win_fn = jax.jit(win_raw)
            done = win_fn
        else:
            from gpemsr_tpu.ops import guard
            win_fn = jax.jit(guard.with_host_guards(win_raw))
            done = lambda *a: win_fn(*a)[0]    # noqa: E731

        f = feats_fn(lq[:, 0])                # compile outside the trace
        feats = tuple(None if t is None else jnp.concatenate([t] * 5, axis=1)
                      for t in f)
        done(feats, lq).block_until_ready()
        with jax.profiler.trace(out):
            f = feats_fn(lq[:, 0])
            feats = tuple(None if t is None else
                          jnp.concatenate([t] * 5, axis=1) for t in f)
            done(feats, lq).block_until_ready()

    for root, _dirs, files in os.walk(out):
        for fn in files:
            p = os.path.join(root, fn)
            print(p, os.path.getsize(p))


if __name__ == "__main__":
    main()
