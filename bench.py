"""Benchmark: GPEMSR x16 full-section SR inference throughput on one TPU chip.

Workload = the reference's headline inference path (output_GPEMSR.py): a
5-frame 64x64 LR window -> one 1024x1024 SR section. Metric is output
megapixels per second, single chip, steady state.

vs_baseline compares against an A100 estimate for the reference PyTorch
implementation: the repo publishes no numbers (BASELINE.md), so we use a
conservative 2.0 MPix/s figure for an EDVR-class multi-frame network with
4 DCN stages + VQGAN prior decode + VGG masking at 1024^2 on A100
(~0.5 s/section). Replace with a measured figure when available.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

A100_BASELINE_MPIX_S = 2.0


def main():
    import os
    import sys

    import jax

    # persistent compilation cache: the full-model compile takes ~10 min over
    # this environment's remote-compile tunnel; cache hits make re-runs fast
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from gpemsr_tpu.models.gpemsr import GPEMSR
    from gpemsr_tpu.utils.precision import bf16_inference

    use_bf16 = "--f32" not in sys.argv
    batch = 1
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])

    cfg = _flagship_cfg()
    model = GPEMSR(cfg)

    h = w = 64                     # full-section LR size (1024 / 16)
    lq0 = jnp.zeros((1, 5, 16, 16, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), lq0)

    streaming = "--per-window" not in sys.argv

    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(0, 1, (batch, 5, h, w, 1)).astype(np.float32))

    if streaming:
        # steady-state cost per output section while sliding along the
        # z-stack: per-frame features computed once per NEW slice + one
        # window-level fusion (windows share 4 of 5 frames; outputs are
        # bit-identical to the per-window path — see
        # tests/test_infer.py::test_streaming_sr_matches_per_window)
        if use_bf16:
            feats_fn = jax.jit(bf16_inference(
                lambda p, f: model.apply(p, f[None, None],
                                         features_only=True), params))
            win_fn = jax.jit(bf16_inference(
                lambda p, ft, x: model.apply(p, x, frame_feats=ft)[0], params))
        else:
            feats_fn = jax.jit(lambda f: model.apply(
                params, f[None, None], features_only=True))
            win_fn = jax.jit(lambda ft, x: model.apply(
                params, x, frame_feats=ft)[0])

        frame = lq[0, 0]
        f1 = feats_fn(frame)
        feats = tuple(jnp.concatenate([t] * 5, axis=1) for t in f1)
        win_fn(feats, lq[:1]).block_until_ready()

        def fwd_once():
            f = feats_fn(frame)
            return win_fn(feats, lq[:1])

        fwd_once().block_until_ready()
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd_once()
        out.block_until_ready()
        dt = time.perf_counter() - t0
        mpix = (h * 16) * (w * 16) / 1e6
    else:
        if use_bf16:
            inner = bf16_inference(lambda p, x: model.apply(p, x)[0], params)
            fwd = jax.jit(inner)
        else:
            @jax.jit
            def fwd(lq):
                sr, _ = model.apply(params, lq)
                return sr

        # warmup / compile
        fwd(lq).block_until_ready()
        fwd(lq).block_until_ready()

        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(lq)
        out.block_until_ready()
        dt = time.perf_counter() - t0

        mpix = batch * (h * 16) * (w * 16) / 1e6
    value = mpix * iters / dt
    print(json.dumps({
        "metric": "sr_x16_inference_throughput",
        "value": round(value, 3),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(value / A100_BASELINE_MPIX_S, 3),
    }))


if __name__ == "__main__":
    main()
