"""Training-step benchmark: full-size stage-3 GPEMSR train step at the
reference's training shapes (GT 256^2, LQ 16^2, N=5) on the current
accelerator.

    python scripts/bench_train.py [batch] [--bf16] [--trace DIR] [--stage N]

--bf16: bf16 compute (f32 master weights), the ParallelConfig.compute_dtype
path — compare against the f32 default.
--trace DIR: capture a jax.profiler device trace of ONE steady-state step
(summarize with scripts/trace_summary.py DIR).
--stage N: bench stage 1 (GAN G+D), 2 (indexer CE) or 3 (default)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_cfg
    from gpemsr_tpu.core.config import DiscriminatorConfig, TrainConfig

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 2
    x8 = "--x8" in sys.argv
    compute_dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    stage = 3
    if "--stage" in sys.argv:
        stage = int(sys.argv[sys.argv.index("--stage") + 1])
    trace_dir = None
    if "--trace" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace") + 1]
        os.makedirs(trace_dir, exist_ok=True)
    cfg = _flagship_cfg()
    if x8:
        # stage-3 x8 training shapes (option/train_stage3_x8.yml: GT 256^2,
        # LQ 32^2): the L1 feature map is 32^2=1024 px, so the dense-path
        # threshold must cover it or training falls onto the serving-oriented
        # windowed/guarded DCN path (see configs/baseline_stage3_x8_v3.yml)
        import dataclasses

        from gpemsr_tpu.core.config import PriorConfig
        dt = 1024
        if "--dense-threshold" in sys.argv:
            dt = int(sys.argv[sys.argv.index("--dense-threshold") + 1])
        cfg = dataclasses.replace(cfg, scale=8, prior=PriorConfig(scale=8),
                                  dcn_dense_threshold=dt)
    tcfg = TrainConfig(ref_loss_factor=0.01)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    if stage == 1:
        from gpemsr_tpu.train.stage1 import (create_models, init_states,
                                             make_d_step, make_g_step)
        imgs = jnp.asarray(rng.uniform(
            0, 1, (batch, 256, 256, 1)).astype(np.float32))
        gen, disc = create_models(cfg.prior, DiscriminatorConfig())
        g_state, d_state = init_states(key, gen, disc, tcfg, imgs)
        g_step = make_g_step(gen, disc, tcfg, use_gan=True,
                             compute_dtype=compute_dtype)
        d_step = make_d_step(gen, disc, tcfg, with_r1=False,
                             compute_dtype=compute_dtype)

        def step_once(g_state, d_state):
            g_state, _dec, gm = g_step(g_state, d_state.params, imgs)
            d_state, dm = d_step(d_state, g_state.params, imgs)
            return g_state, d_state, {**gm, **dm}

        t0 = time.perf_counter()
        g_state, d_state, m = step_once(g_state, d_state)
        _ = float(m["rec_loss"])
        print(f"first step (compile) {time.perf_counter() - t0:.1f}s",
              flush=True)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            g_state, d_state, m = step_once(g_state, d_state)
        _ = float(m["rec_loss"])           # fetch forces the whole chain
        dt = (time.perf_counter() - t0) / iters
        label = "stage-1 G+D step"
        if trace_dir:
            with jax.profiler.trace(trace_dir):
                g_state, d_state, m = step_once(g_state, d_state)
                _ = float(m["rec_loss"])
    elif stage == 2:
        from gpemsr_tpu.train.stage2 import init_stage2, make_stage2_step
        lr_imgs = jnp.asarray(rng.uniform(
            0, 1, (batch, 16, 16, 1)).astype(np.float32))
        gt_imgs = jnp.asarray(rng.uniform(
            0, 1, (batch, 256, 256, 1)).astype(np.float32))
        model, state, frozen = init_stage2(key, cfg.prior, tcfg,
                                           lr_imgs, gt_imgs)
        step = make_stage2_step(model, compute_dtype=compute_dtype)
        t0 = time.perf_counter()
        state, m = step(state, frozen, lr_imgs, gt_imgs)
        _ = float(m["ce_loss"])
        print(f"first step (compile) {time.perf_counter() - t0:.1f}s",
              flush=True)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, frozen, lr_imgs, gt_imgs)
        _ = float(m["ce_loss"])
        dt = (time.perf_counter() - t0) / iters
        label = "stage-2 CE step"
        if trace_dir:
            with jax.profiler.trace(trace_dir):
                state, m = step(state, frozen, lr_imgs, gt_imgs)
                _ = float(m["ce_loss"])
    else:
        from gpemsr_tpu.train.stage3 import init_stage3, make_stage3_step
        lq_size = 32 if x8 else 16
        lq = jnp.asarray(rng.uniform(
            0, 1, (batch, 5, lq_size, lq_size, 1)).astype(np.float32))
        gt = jnp.asarray(rng.uniform(
            0, 1, (batch, 256, 256, 1)).astype(np.float32))
        t0 = time.perf_counter()
        model, state, frozen = init_stage3(key, cfg, tcfg, lq)
        print(f"init {time.perf_counter() - t0:.1f}s", flush=True)
        step = make_stage3_step(model, tcfg, compute_dtype=compute_dtype)
        t0 = time.perf_counter()
        state, m = step(state, frozen, lq, gt)
        _ = float(m["rec_loss"])
        print(f"first step (compile) {time.perf_counter() - t0:.1f}s",
              flush=True)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, frozen, lq, gt)
        _ = float(m["rec_loss"])
        dt = (time.perf_counter() - t0) / iters
        label = "stage-3 train step"
        if trace_dir:
            with jax.profiler.trace(trace_dir):
                state, m = step(state, frozen, lq, gt)
                _ = float(m["rec_loss"])

    print(f"{label} (batch={batch}): {dt * 1000:.1f} ms "
          f"({batch / dt:.2f} samples/s)")
    if trace_dir:
        print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main()
