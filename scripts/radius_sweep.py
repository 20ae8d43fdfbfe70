"""Find the smallest safe DCN window radius for a TRAINED checkpoint.

The Pallas windowed DCN (`ops/dcn_pallas.py`) costs ~(2r+1)^2 shifted
samples per tap; the r3 profile table puts r=4 at 7.5 ms/call at the 64^2
L1 level — two such calls dominate the x16 window stage. The kernel is
exact only when every sampling offset stays inside the radius window, and
every call is guarded (a miss falls back to the exact gather path), so a
smaller radius is ALWAYS correct — just slower if it misses often.

This script runs the trained model over a real LR stack in host-guard mode
(ops/guard.py::with_host_guards — the collected predicate is the AND of
every windowed call's in-window check) once per candidate radius, and
reports the guard hit-rate. The smallest radius with 100% hits is safe to
make the default for serving that checkpoint.

Usage:
  python scripts/radius_sweep.py --ckpt runs/baseline_v3/baseline_stage3/checkpoints \
      --lr-dir dataset/synth/test/LR [--radii 4,3,2,1] [--x8] [--offline]

--offline measures instead of sweeping: ONE pass in radius-probe mode
(ops/guard.py::with_radius_probe) computes every DCN via the exact gather
path while recording the minimum window radius its offsets require, and
reports the per-section maximum. Backend-agnostic (JAX_PLATFORMS=cpu works),
so the serving radius can be sized while the TPU is busy training. Covers
the DCN windows only — the SpyNet flow-warp window guard is separate and
unaffected by dcn_window_radius.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(ROOT, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpemsr_tpu.core import checkpoint as ckpt
    from gpemsr_tpu.core.config import GPEMSRConfig, PriorConfig
    from gpemsr_tpu.infer.sr import window_indices
    from gpemsr_tpu.models.gpemsr import GPEMSR
    from gpemsr_tpu.ops import guard
    from gpemsr_tpu.train.common import merge_params
    from gpemsr_tpu.utils.image import read_img
    from gpemsr_tpu.utils.precision import bf16_inference

    ckpt_dir = sys.argv[sys.argv.index("--ckpt") + 1]
    lr_dir = sys.argv[sys.argv.index("--lr-dir") + 1]
    radii = [4, 3, 2, 1]
    if "--radii" in sys.argv:
        radii = [int(r) for r in
                 sys.argv[sys.argv.index("--radii") + 1].split(",")]
    scale = 8 if "--x8" in sys.argv else 16

    payload = ckpt.restore(ckpt_dir)
    model_frozen = {k: v for k, v in payload["frozen"].items()
                    if k != "cx_vgg"}
    params = {"params": merge_params(payload["params"], model_frozen)}

    ids = sorted(int(os.path.splitext(f)[0]) for f in os.listdir(lr_dir)
                 if f.endswith(".png"))
    if "--limit" in sys.argv:
        # probe a z-prefix only — the CPU gather path over every section of
        # an x8 stack is hours of compute and ~half the host RAM; a dozen
        # sections bound the radius just as well for sizing purposes
        ids = ids[:int(sys.argv[sys.argv.index("--limit") + 1])]
    stack = np.stack([read_img(os.path.join(lr_dir, f"{i}.png"))
                      for i in ids], 0)
    Z = stack.shape[0]
    stack_dev = jnp.asarray(stack)

    if "--offline" in sys.argv:
        cfg = GPEMSRConfig(scale=scale, prior=PriorConfig(scale=scale))
        if "--dense-threshold" in sys.argv:
            cfg = dataclasses.replace(
                cfg, dcn_dense_threshold=int(
                    sys.argv[sys.argv.index("--dense-threshold") + 1]))
        model = GPEMSR(cfg)
        win = jax.jit(guard.with_radius_probe(bf16_inference(
            lambda p, x: model.apply(p, x)[0], params)))
        per_section = []
        for z in range(Z):
            idxs = window_indices(z, Z, cfg.nframes)
            lq = jnp.take(stack_dev, jnp.asarray(idxs), axis=0)[None]
            _sr, needed = win(lq)
            needed = np.asarray(needed)          # [n_calls, (Ry, Rx)]
            per_section.append(needed.tolist())
            print(f"section {z}: needed (Ry, Rx) per call "
                  f"{needed.tolist()}", flush=True)
        agg = np.max(np.asarray(per_section), axis=0)
        print(json.dumps({
            "sections": Z,
            "max_needed_radius": int(np.max(agg)) if agg.size else -1,
            "per_call_yx_max": agg.tolist(),
            "per_section": per_section,
        }))
        return

    results = {}
    for r in radii:
        cfg = GPEMSRConfig(scale=scale, prior=PriorConfig(scale=scale))
        cfg = dataclasses.replace(cfg, dcn_window_radius=r)
        model = GPEMSR(cfg)
        win = jax.jit(guard.with_host_guards(bf16_inference(
            lambda p, x: model.apply(p, x)[0], params)))
        misses = 0
        for z in range(Z):
            idxs = window_indices(z, Z, cfg.nframes)
            lq = jnp.take(stack_dev, jnp.asarray(idxs), axis=0)[None]
            _sr, ok = win(lq)
            misses += int(not bool(ok))
        results[r] = {"sections": Z, "guard_misses": misses}
        print(f"radius {r}: {misses}/{Z} sections missed the window",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
