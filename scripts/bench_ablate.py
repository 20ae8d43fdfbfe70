"""Ablation timings for the x16 full-section SR forward on TPU: which
subsystem dominates? Run: python scripts/bench_ablate.py [component ...]

Components: full, noref (w_ref=False), prior (ref_extract only),
vgg (relu1_2 on 10x 1024^2 images), spynet (8x 256^2 flow pairs)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    from __graft_entry__ import _flagship_cfg
    from gpemsr_tpu.models.gpemsr import GPEMSR
    import dataclasses

    which = sys.argv[1:] or ["full", "noref", "prior", "vgg"]
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(0, 1, (1, 5, 64, 64, 1)).astype(np.float32))
    lq0 = jnp.zeros((1, 5, 16, 16, 1), jnp.float32)

    if "full" in which:
        cfg = _flagship_cfg()
        model = GPEMSR(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), lq0)
        f = jax.jit(lambda x: model.apply(params, x)[0])
        print("full:", timeit(f, lq), "s/section", flush=True)

    if "noref" in which:
        cfg = dataclasses.replace(_flagship_cfg(), w_ref=False)
        model = GPEMSR(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), lq0)
        f = jax.jit(lambda x: model.apply(params, x)[0])
        print("noref:", timeit(f, lq), "s/section", flush=True)

    if "prior" in which:
        from gpemsr_tpu.models.prior import LRGenerator
        cfg = _flagship_cfg()
        m = LRGenerator(cfg.prior)
        lr0 = jnp.zeros((5, 16, 16, 1), jnp.float32)
        gt0 = jnp.zeros((5, 256, 256, 1), jnp.float32)
        params = jax.jit(lambda k: m.init(k, lr0, gt0, method=m.init_all))(
            jax.random.PRNGKey(0))
        xf = lq.reshape(5, 64, 64, 1)
        f = jax.jit(lambda x: m.apply(params, x, method=m.ref_extract)[0])
        print("prior(ref_extract x5):", timeit(f, xf), "s", flush=True)

    if "vgg" in which:
        from gpemsr_tpu.models.vgg import VGG19Features
        m = VGG19Features(max_layer="relu1_2")
        x0 = jnp.zeros((10, 1024, 1024, 3), jnp.float32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x0)
        x = jnp.asarray(rng.uniform(0, 1, (10, 1024, 1024, 3)).astype(np.float32))
        f = jax.jit(lambda t: m.apply(params, t)["relu1_2"])
        print("vgg relu1_2 x10@1024^2:", timeit(f, x), "s", flush=True)


if __name__ == "__main__":
    main()
