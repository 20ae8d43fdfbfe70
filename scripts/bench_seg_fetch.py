"""Measure the affinity-fetch options end-to-end (VERDICT r2 #6 / r3 #6).

Runs the full seg protocol (tiled affinities -> watershed -> waterz ->
VOI/ARAND, reference roles inference_seg.py:108-167) on the same volume and
seg net once per fetch mode — f32, f16 (run_seg_eval.py --fetch-f16), and
u8 + device-computed f16 boundary (--fetch-u8) — and prints wall-clock plus
the VOI/ARAND deltas vs the f32 run. The device->host fetch dominates
protocol time on low-bandwidth links (~845 MB f32 for 50x1024^2); this
script provides the measured quality guard for those trades.

Usage: python scripts/bench_seg_fetch.py [--volume hr|sr] [--skip-f32]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main():
    import jax

    from gpemsr_tpu.core import checkpoint as ckpt
    from gpemsr_tpu.core.config import SegConfig, load_yaml
    from gpemsr_tpu.core.platform import init_platform
    from gpemsr_tpu.models.seg.superhuman import UNetSuperhuman
    from gpemsr_tpu.seg.inference import evaluate_segmentation, load_labels

    init_platform()
    data = os.path.join(ROOT, "dataset", "synth")
    use_sr = "--volume" in sys.argv and "sr" in sys.argv[
        sys.argv.index("--volume") + 1]

    cfg = load_yaml(os.path.join(ROOT, "configs", "seg_x16_superhuman.yml"),
                    SegConfig)
    payload = ckpt.restore(os.path.join(ROOT, "runs", "baseline",
                                        "seg_superhuman", "checkpoints"))
    variables = {"params": payload["params"]}
    if "batch_stats" in payload:
        variables["batch_stats"] = payload["batch_stats"]
    model = UNetSuperhuman(filters=tuple(cfg.model.filters),
                           out_planes=cfg.model.output_nc,
                           if_sigmoid=cfg.model.if_sigmoid)
    apply_fn = jax.jit(lambda x: model.apply(variables, x))

    from PIL import Image
    suffix = os.environ.get("GPEMSR_BASELINE_SUFFIX", "_v2")
    img_dir = os.path.join(data, "test",
                           f"SR{suffix}/x16" if use_sr else "HR")
    ids = sorted(int(os.path.splitext(f)[0]) for f in os.listdir(img_dir)
                 if f.endswith(".png"))
    vol = np.stack([np.asarray(Image.open(
        os.path.join(img_dir, f"{i}.png"))) for i in ids], 0).astype(np.float32)
    labels = load_labels(os.path.join(data, "test", "labels.h5"),
                         test_split=vol.shape[0])

    modes = [("f32", None), ("f16", np.float16), ("u8", np.uint8)]
    if "--skip-f32" in sys.argv:      # the f32 run alone is ~1 min of fetch
        modes = modes[1:]
    rows = {}
    for name, fdt in modes:
        t0 = time.perf_counter()
        s = evaluate_segmentation(apply_fn, vol, labels, cfg,
                                  fetch_dtype=fdt)
        rows[name] = {"voi_split": round(s.voi_split, 4),
                      "voi_merge": round(s.voi_merge, 4),
                      "voi_sum": round(s.voi_sum, 4),
                      "arand": round(s.arand, 4),
                      "infer_s": round(s.inference_time, 1),
                      "protocol_s": round(time.perf_counter() - t0, 1)}
        print(name, rows[name], flush=True)
    base = "f32" if "f32" in rows else "f16"
    for name in rows:
        if name != base:
            rows[f"delta_{name}"] = {
                k: round(rows[name][k] - rows[base][k], 4)
                for k in ("voi_sum", "arand")}
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
