"""Measured wall-clock per window-stage submodule on the real device.

cost_analysis (scripts/profile_table.py) bounds the window stage at ~11 ms
roofline while the measured stage is ~56 ms — this script finds where the
gap lives by chained-jit timing (relay overhead subtracted, see
scripts/bench_profile.py) of each submodule at production shapes:

  window   — full window-level stage (align + fusion + recon) from cached
             per-frame features, the streaming steady-state's big half
  align    — POD alignment total (includes SpyNet + 5 DCNs)
  spynet   — the SpyNet flow estimates alone (5 pairs at 4x upsample)
  fusion   — ThreeDA temporal-spatial attention
  dcn_*    — one DCNPack-shaped deform_conv2d call per route at the L1
             (64x64) and L2 (32x32) pyramid sizes: pallas (windowed r=4),
             gather (slab), dense (one-hot MXU)
  derived  — pod_minus_spynet, recon (= window - align - fusion)

Usage: python scripts/bench_window_parts.py [--f32] [--iters=N] [--json out]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _bench_util import timed_chain  # noqa: E402
from __graft_entry__ import _flagship_cfg
from gpemsr_tpu.models.gpemsr import GPEMSR
from gpemsr_tpu.ops.dcn import deform_conv2d
from gpemsr_tpu.utils.precision import bf16_inference, cast_floats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--f32", action="store_true")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--json")
    args = p.parse_args()
    iters = args.iters

    cfg = _flagship_cfg()
    model = GPEMSR(cfg)
    h = w = 64
    nf = cfg.nf
    BN = 5
    rng = np.random.default_rng(0)
    lq0 = jnp.zeros((1, 5, 16, 16, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), lq0)
    dt = jnp.float32 if args.f32 else jnp.bfloat16
    params_c = params if args.f32 else cast_floats(params, jnp.bfloat16)
    wrap = (lambda f: f) if args.f32 else bf16_inference

    oh = timed_chain(lambda c: c + 1.0, jnp.ones((8, 128), jnp.float32), iters)

    def dep(c):
        return (c.astype(jnp.float32).ravel()[0] * 1e-20).astype(dt)

    res = {}

    def run(name, step, init):
        t = (timed_chain(step, init, iters) - oh) / iters
        res[name] = t * 1e3
        print(f"{name:24s} {t * 1e3:8.2f} ms", flush=True)

    # full window-level stage from cached features
    lq = jnp.asarray(rng.uniform(0, 1, (1, 5, h, w, 1)).astype(np.float32))
    feats_fn = wrap(lambda p, f: model.apply(p, f[:, None],
                                             features_only=True), params)
    f1 = feats_fn(lq[:, 0])
    feats = tuple(None if t is None else jnp.concatenate([t] * 5, axis=1)
                  for t in f1)
    win_fn = wrap(lambda p, ft, x: model.apply(p, x, frame_feats=ft)[0],
                  params)

    def win_step(c):
        return win_fn(feats, lq + dep(c).astype(lq.dtype))

    run("window", win_step, jnp.zeros((1, h * 16, w * 16, 1), jnp.float32))

    # POD align (includes spynet + DCNs)
    n1 = jnp.asarray(rng.uniform(-1, 1, (BN, h, w, nf))).astype(dt)
    n2 = jnp.asarray(rng.uniform(-1, 1, (BN, h // 2, w // 2, nf))).astype(dt)
    n3 = jnp.asarray(rng.uniform(-1, 1, (BN, h // 4, w // 4, nf))).astype(dt)
    fr = jnp.asarray(rng.uniform(0, 1, (BN, h, w, 1))).astype(dt)

    @jax.jit
    def align_fn(prm, a, b, c, d, e, f, g, hh):
        return model.apply(
            prm, [a, b, c], [d, e, f], g, hh,
            method=lambda m, nbr, ref, fx, cx: m.align(nbr, ref, fx, cx,
                                                       m.spynet))

    def align_step(c):
        return align_fn(params_c, n1 + dep(c), n2, n3, n1, n2, n3, fr, fr)

    run("align", align_step, n1)

    # SpyNet alone at the window's working size (4x-upsampled pairs)
    up = jnp.asarray(rng.uniform(0, 1, (BN, h * 4, w * 4, 1))).astype(dt)

    @jax.jit
    def spy_fn(prm, a, b):
        return model.apply(prm, a, b,
                           method=lambda m, x, y: m.spynet(x, y))

    def spy_step(c):
        f = spy_fn(params_c, c, up)
        # carry keeps the input's shape; tiny flow feedback carries the
        # data dependence so the loop body can't be DCE'd or overlapped
        return c + f[..., :1].astype(dt) * 1e-20

    run("spynet", spy_step, up)

    # ThreeDA fusion
    al = jnp.asarray(rng.uniform(-1, 1, (1, 5, h, w, nf))).astype(dt)

    @jax.jit
    def fuse_fn(prm, a):
        return model.apply(prm, a, method=lambda m, x: m.fusion(x))

    def fuse_step(c):
        f = fuse_fn(params_c, c)
        return c + f[:, None].astype(dt) * 1e-20

    run("fusion", fuse_step, al)

    # one DCNPack-shaped deform_conv2d per route, L1 and L2 sizes
    for lvl, (hh, ww) in (("l1", (h, w)), ("l2", (h // 2, w // 2))):
        x = jnp.asarray(rng.uniform(-1, 1, (BN, hh, ww, nf))).astype(dt)
        off = jnp.asarray(rng.uniform(-2, 2, (BN, hh, ww, 2 * 8 * 9))
                          ).astype(dt)
        mask = jax.nn.sigmoid(jnp.asarray(
            rng.uniform(-1, 1, (BN, hh, ww, 8 * 9))).astype(dt))
        wgt = jnp.asarray(rng.uniform(-.1, .1, (9, nf, nf))).astype(dt)
        routes = {
            "pallas": dict(window_radius=4, dense_threshold=0),
            "gather": dict(window_radius=0, dense_threshold=0),
            "dense": dict(window_radius=0, dense_threshold=1 << 30),
        }
        for rname, kw in routes.items():
            fn = jax.jit(lambda xx, oo, mm: deform_conv2d(
                xx, oo, mm, wgt, deformable_groups=8, **kw))

            def dcn_step(c, fn=fn):
                return fn(x + dep(c), off, mask)

            run(f"dcn_{lvl}_{rname}", dcn_step, x)

    res["pod_minus_spynet"] = res["align"] - res["spynet"]
    res["recon_derived"] = res["window"] - res["align"] - res["fusion"]
    print(f"{'pod_minus_spynet':24s} {res['pod_minus_spynet']:8.2f} ms")
    print(f"{'recon_derived':24s} {res['recon_derived']:8.2f} ms")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
