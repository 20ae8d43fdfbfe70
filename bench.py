"""Benchmark: GPEMSR x16 full-section SR inference throughput on one TPU chip.

Workload: the production z-stack streaming path (output_sr.py ->
infer/sr.py::sr_stack_streaming): per new section, compute the per-frame
feature pyramid ONCE for the incoming slice and run the window-level
alignment/fusion/upsampling that produces one 1024x1024 SR section
(windows share 4 of 5 frames; outputs are bit-identical to the per-window
path — tests/test_infer.py::test_streaming_sr_matches_per_window).

Timing method: this environment reaches the chip through a relay whose
dispatch/fetch overhead is ~30 ms and whose block_until_ready does not wait
for remote execution, so per-dispatch timing (as in round 1) measures the
relay, not the chip. Here the steady-state step (feats + window assembly +
window forward) is chained data-dependently ITERS times inside ONE jit and
fetched once; the measured empty-chain overhead is subtracted. The result is
pure device time per section — what a production driver (which batches
dispatches) would see.

vs_baseline: the repo publishes no numbers (BASELINE.md), so the baseline is
an ESTIMATE of the reference PyTorch pipeline on A100: an EDVR-class
multi-frame net with 4 DCN stages + VQGAN prior decode + VGG masking at
1024^2 output, ~0.5 s/section => 2.0 MPix/s. Treat the absolute ratio as
indicative; the measured MPix/s is the hard number.

Prints ONE final JSON line: {"metric", "value", "unit", "vs_baseline"}.
A PROVISIONAL line (same schema, measured from the first rep) is printed as
soon as the first timed repetition completes, so a driver timeout that kills
the process mid-benchmark still leaves a parseable result on stdout — the
final line simply overrides it when reached (round-2 lesson: BENCH_r02 was
rc=124 with nothing printed).
Flags: --f32 (disable bf16), --per-window (reference-style full forward per
section), --batch=N (sections processed concurrently), --iters=N, --x8
(bench the x8 model; metric name changes accordingly),
--guard-mode=host|defer|percall (windowed-kernel exactness guards: "host" =
straight-line kernels with the predicate returned alongside the outputs,
"defer" = one whole-forward lax.cond, "percall" = a cond per dispatch;
defaults: percall at x16, defer at x8 — the fastest measured per scale;
--defer-guards is back-compat for defer).
"""

from __future__ import annotations

import json
import sys
import time

A100_BASELINE_MPIX_S = 2.0


def main():
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from gpemsr_tpu.models.gpemsr import GPEMSR
    from gpemsr_tpu.utils.precision import bf16_inference

    use_bf16 = "--f32" not in sys.argv
    streaming = "--per-window" not in sys.argv
    x8 = "--x8" in sys.argv
    batch = 1
    iters = 6
    streams = 1
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        if a.startswith("--iters="):
            iters = int(a.split("=")[1])
        if a.startswith("--streams="):
            # N INDEPENDENT batch-1 stacks advanced alternately per step —
            # the multi-stack serving alternative to --batch=N (which is
            # bandwidth-bound and loses ~10%): same per-stream graphs as
            # batch=1, aggregate throughput reported
            streams = int(a.split("=")[1])

    scale = 8 if x8 else 16
    if x8:
        from gpemsr_tpu.core.config import GPEMSRConfig, PriorConfig
        cfg = GPEMSRConfig(scale=8, prior=PriorConfig(scale=8))
    else:
        cfg = _flagship_cfg()
    # perf-experiment overrides (not the shipped defaults)
    import dataclasses
    for a in sys.argv[1:]:
        if a.startswith("--dense-threshold="):
            cfg = dataclasses.replace(
                cfg, dcn_dense_threshold=int(a.split("=")[1]))
        if a.startswith("--window-radius="):
            cfg = dataclasses.replace(
                cfg, dcn_window_radius=int(a.split("=")[1]))
        if a.startswith("--cascade-radius="):
            cfg = dataclasses.replace(
                cfg, dcn_cascade_window_radius=int(a.split("=")[1]))
    model = GPEMSR(cfg)
    h = w = 1024 // scale          # full-section LR size
    lq0 = jnp.zeros((1, 5, 16, 16, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), lq0)

    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(0, 1, (batch, 5, h, w, 1)).astype(np.float32))

    if use_bf16:
        feats_fn = bf16_inference(
            lambda p, f: model.apply(p, f[:, None], features_only=True),
            params)
        win_fn = bf16_inference(
            lambda p, ft, x: model.apply(p, x, frame_feats=ft)[0], params)
        full_fn = bf16_inference(lambda p, x: model.apply(p, x)[0], params)
    else:
        feats_fn = lambda f: model.apply(          # noqa: E731
            params, f[:, None], features_only=True)
        win_fn = lambda ft, x: model.apply(        # noqa: E731
            params, x, frame_feats=ft)[0]
        full_fn = lambda x: model.apply(params, x)[0]   # noqa: E731

    # guard mode (measured r4, one v5e chip — differences are small and
    # scale-dependent: x16 percall 23.25 / defer 22.87 / host 22.85 MPix/s;
    # x8 defer 10.89 / host 10.71 / percall 10.25): default percall at x16
    # (the fastest measured), defer at x8. sr_stack_streaming's production
    # default stays "host" — same device throughput within noise, and it
    # enables the dispatch-ahead fetch/encode overlap in the exporter.
    guard_mode = "defer" if "--x8" in sys.argv else "percall"
    if "--defer-guards" in sys.argv:
        guard_mode = "defer"
    for a in sys.argv[1:]:
        if a.startswith("--guard-mode="):
            guard_mode = a.split("=")[1]
    from gpemsr_tpu.ops import guard
    if guard_mode == "host":
        win_fn = guard.with_host_guards(win_fn)     # -> (sr, ok)
        full_fn = guard.with_host_guards(full_fn)
    elif guard_mode == "defer":
        win_fn = guard.with_deferred_guards(win_fn)
        full_fn = guard.with_deferred_guards(full_fn)

    mpix = batch * (h * scale) * (w * scale) / 1e6
    metric = f"sr_x{scale}_inference_throughput"

    def emit(value):
        print(json.dumps({
            "metric": metric,
            "value": round(value, 3),
            "unit": "megapixels/sec/chip",
            "vs_baseline": round(value / A100_BASELINE_MPIX_S, 3),
        }), flush=True)

    def timed_chain(step, init, reps=2, overhead=0.0, provisional=False):
        @jax.jit
        def chained(c0):
            return jax.lax.fori_loop(0, iters, lambda i, c: step(c), c0)

        out = chained(init)
        _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
        ts = []
        for _r in range(reps):
            t0 = time.perf_counter()
            out = chained(init)
            _ = float(jax.tree_util.tree_leaves(out)[0]
                      .astype(jnp.float32).sum())
            ts.append(time.perf_counter() - t0)
            if provisional and _r == 0:
                # timeout insurance: a parseable result as soon as possible
                emit(mpix / ((ts[0] - overhead) / iters))
        return min(ts)

    overhead = timed_chain(lambda c: c + 1.0, jnp.ones((8, 128), jnp.float32))

    frames = lq[:, 0]              # [batch, h, w, 1] — the incoming slices

    def dep(c):
        return 1e-6 * c.astype(jnp.float32).mean()

    # In host-guard mode the forward returns (sr, ok); the ok reduce is part
    # of the production steady state, so thread it through the carry (a
    # dropped output would be dead-code-eliminated and understate the cost).
    if streaming and streams > 1:
        # N independent stacks advanced alternately (multi-stack serving):
        # each stream's forward depends only on ITS previous section, so the
        # scheduler may interleave streams to fill pipeline bubbles; the
        # graphs are the batch-1 graphs (the bandwidth-bound batch=N graph
        # is avoided entirely)
        def one_stream(c_sr, c_ok, salt):
            f = feats_fn(frames + (dep(c_sr) + salt).astype(frames.dtype))
            feats = tuple(None if t is None else
                          jnp.concatenate([t] * 5, axis=1) for t in f)
            out = win_fn(feats, lq)
            if guard_mode == "host":
                sr, ok = out
                return sr, c_ok + ok.astype(jnp.float32)
            return out, c_ok

        def step(c):
            srs, c_ok = c
            new = []
            for i, s in enumerate(srs):
                sr, c_ok = one_stream(s, c_ok, 1e-6 * (i + 1))
                new.append(sr)
            return tuple(new), c_ok
    elif streaming:
        # steady state of sr_stack_streaming: new-slice features + window
        # assembly (concat across the shared window) + window-level forward
        def step(c):
            f = feats_fn(frames + dep(c[0]).astype(frames.dtype))
            feats = tuple(None if t is None else
                          jnp.concatenate([t] * 5, axis=1) for t in f)
            out = win_fn(feats, lq)
            if guard_mode == "host":
                sr, ok = out
                return sr, c[1] + ok.astype(jnp.float32)
            return out, c[1]
    else:
        def step(c):
            out = full_fn(lq + dep(c[0]).astype(lq.dtype))
            if guard_mode == "host":
                sr, ok = out
                return sr, c[1] + ok.astype(jnp.float32)
            return out, c[1]

    sr0 = jnp.zeros((batch, h * scale, w * scale, 1), jnp.float32)
    if streaming and streams > 1:
        init = (tuple(sr0 + i for i in range(streams)),
                jnp.zeros((), jnp.float32))
        mpix *= streams
    else:
        init = (sr0, jnp.zeros((), jnp.float32))
    t = (timed_chain(step, init, overhead=overhead, provisional=True)
         - overhead) / iters
    emit(mpix / t)


if __name__ == "__main__":
    main()
