"""Per-stage FLOPs/bytes/roofline table from XLA cost_analysis (VERDICT #9).

jax.profiler traces cannot be served over this environment's relay, so
optimization targets are ranked from compiled-graph cost analysis instead:
for each stage of the production streaming SR path (and its window-stage
submodules), print XLA's FLOPs and bytes-accessed, plus the v5e roofline
time bound max(FLOPs/peak_flops, bytes/peak_bw) — the "speed of light" for
that stage. Measured wall-clock (scripts/bench_profile.py) over roofline
bound = how far from the light the implementation is.

Run on the TPU backend for the production numbers (compile-cached); pass
--cpu for a quick structural check.

Usage: python scripts/profile_table.py [--cpu] [--x8] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# v5e peak: 197 TFLOP/s bf16, ~819 GB/s HBM
PEAK_FLOPS = 197e12
PEAK_BW = 819e9


def cost_of(fn, *args):
    import jax
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return {"flops": float(c.get("flops", 0.0)),
            "bytes": float(c.get("bytes accessed", 0.0))}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--x8", action="store_true")
    p.add_argument("--json")
    args = p.parse_args()

    if args.cpu:
        from gpemsr_tpu.parallel.mesh import ensure_cpu_devices
        ensure_cpu_devices(1)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(ROOT, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_cfg
    from gpemsr_tpu.core.config import GPEMSRConfig, PriorConfig
    from gpemsr_tpu.models.gpemsr import GPEMSR
    from gpemsr_tpu.utils.precision import bf16_inference

    scale = 8 if args.x8 else 16
    # x8 needs the prior's scale too (Indexer8's extra DownBlock) — same
    # construction as bench.py::bench_sr
    cfg = (_flagship_cfg() if scale == 16
           else GPEMSRConfig(scale=8, prior=PriorConfig(scale=8)))
    model = GPEMSR(cfg)
    h = w = 1024 // scale
    rng = np.random.default_rng(0)
    lq0 = jnp.zeros((1, 5, 16, 16, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), lq0)
    lq = jnp.asarray(rng.uniform(0, 1, (1, 5, h, w, 1)).astype(np.float32))
    frame = lq[:, 0]

    feats_fn = bf16_inference(
        lambda p, f: model.apply(p, f[:, None], features_only=True), params)
    win_fn = bf16_inference(
        lambda p, ft, x: model.apply(p, x, frame_feats=ft)[0], params)
    full_fn = bf16_inference(lambda p, x: model.apply(p, x)[0], params)

    rows = {}
    rows["per_frame_features"] = cost_of(feats_fn, frame)
    feats = jax.eval_shape(feats_fn, frame)
    feats_c = tuple(None if t is None else jnp.zeros(
        (t.shape[0], 5) + t.shape[2:], t.dtype) for t in feats)
    rows["window_stage"] = cost_of(win_fn, feats_c, lq)
    rows["full_forward_per_window"] = cost_of(full_fn, lq)

    # window-stage submodules (method-targeted applies on the same shapes)
    nf = cfg.nf
    BN = 5
    n1 = jnp.zeros((BN, h, w, nf), jnp.bfloat16)
    n2 = jnp.zeros((BN, h // 2, w // 2, nf), jnp.bfloat16)
    n3 = jnp.zeros((BN, h // 4, w // 4, nf), jnp.bfloat16)
    fr = jnp.zeros((BN, h, w, 1), jnp.bfloat16)

    from gpemsr_tpu.utils.precision import cast_floats
    params_bf = cast_floats(params, jnp.bfloat16)

    def align_fn(prm, a, b, c, d, e, f, g, hh):
        return model.apply(
            prm, [a, b, c], [d, e, f], g, hh,
            method=lambda m, nbr, ref, fx, cx: m.align(nbr, ref, fx, cx,
                                                       m.spynet))

    rows["align_POD"] = cost_of(align_fn, params_bf, n1, n2, n3,
                                n1, n2, n3, fr, fr)

    al = jnp.zeros((1, 5, h, w, nf), jnp.bfloat16)

    def fuse_fn(prm, a):
        return model.apply(prm, a, method=lambda m, x: m.fusion(x))

    rows["fusion_ThreeDA"] = cost_of(fuse_fn, params_bf, al)

    out = {}
    print(f"{'stage':28s} {'GFLOP':>10s} {'GB':>8s} {'roofline_ms':>12s} "
          f"{'bound':>8s}")
    for name, c in rows.items():
        t_flops = c["flops"] / PEAK_FLOPS
        t_bw = c["bytes"] / PEAK_BW
        ms = max(t_flops, t_bw) * 1e3
        bound = "compute" if t_flops >= t_bw else "memory"
        out[name] = {**c, "roofline_ms": ms, "bound": bound}
        print(f"{name:28s} {c['flops'] / 1e9:10.2f} {c['bytes'] / 1e9:8.3f} "
              f"{ms:12.3f} {bound:>8s}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
