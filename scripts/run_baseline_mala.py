"""MALA re-run of the protocol on the current baseline's SR volume.

The reference evaluates BOTH segmentation backbones on the SR output
(inference_code/config/seg_x16_{superhuman,mala}.yaml — the configs differ
only in model_type); v1 (round 2) recorded MALA numbers ad hoc, and VERDICT
r4 #4 asks for the MALA re-run on the v3 weights. This script makes it a
first-class, resumable, fingerprint-keyed phase:

  1. train (or resume) the protocol MALA net on the HR train volume,
     keyed on the dataset content fingerprint (run_baseline.py semantics)
  2. HR-oracle eval with the same VOI sanity gate
  3. seg-on-SR eval over dataset/synth/test/SR{suffix}/x16

  GPEMSR_BASELINE_SUFFIX=_v3 python scripts/run_baseline_mala.py
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from gpemsr_tpu.core.platform import init_platform  # noqa: E402

init_platform()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import run_baseline as rb  # noqa: E402
from run_baseline import record, sh  # noqa: E402
from scripts import fingerprint_dataset as fp  # noqa: E402

DATA = rb.DATA
SUFFIX = os.environ.get("GPEMSR_BASELINE_SUFFIX", "")
RUNS = os.path.join(ROOT, "runs", "baseline" + SUFFIX)
SEG_RUNS = os.path.join(ROOT, "runs", "baseline")   # protocol nets (HR-only)
SR_DIR = os.path.join(DATA, "test", "SR" + SUFFIX, "x16")

rb.RUNS = RUNS
rb.RESULTS = os.path.join(RUNS, "RESULTS.json")

# MALA is ~16x the params of superhuman and its (53,268,268) valid-conv crop
# is ~8x the voxels of the superhuman crop; 3000 steps at batch 1 matched the
# reference-protocol quality bar in round 2 (HR-oracle VOI 0.34).
MALA_STEPS = int(os.environ.get("GPEMSR_MALA_STEPS", "3000"))


def train_mala_net():
    data_fp = fp.ensure(DATA)
    out = os.path.join(SEG_RUNS, "seg_mala")
    fp_file = os.path.join(out, "DATA_FINGERPRINT")
    trained_fp = None
    if os.path.exists(fp_file):
        with open(fp_file) as f:
            trained_fp = f.read().split()[0]
    ckpts = os.path.join(out, "checkpoints")
    have_ckpt = os.path.isdir(ckpts) and os.listdir(ckpts)
    if have_ckpt and trained_fp != data_fp:
        from gpemsr_tpu.core.logging import mkdir_and_rename
        print(f"MALA net was trained on a different data draw "
              f"({(trained_fp or 'unrecorded')[:12]} != {data_fp[:12]}) — "
              f"archiving and retraining", flush=True)
        mkdir_and_rename(out)
        have_ckpt = False
    from gpemsr_tpu.core import checkpoint as ckpt
    if have_ckpt and (ckpt.latest_step(ckpts) or 0) >= MALA_STEPS:
        print("MALA net already trained (fingerprint match)")
        return
    os.makedirs(out, exist_ok=True)
    with open(fp_file, "w") as f:       # before training: resume-safe (r4)
        f.write(data_fp + "\n")
    sh([sys.executable, "train_seg.py",
        "-c", "configs/seg_x16_mala.yml",
        "--raw", os.path.join(DATA, "train_raw.h5"),
        "--labels", os.path.join(DATA, "train_labels.h5"),
        "--steps", str(MALA_STEPS), "--batch", "1", "--out", out,
        "--save-every", "500"])


def seg_eval():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from gpemsr_tpu.core import checkpoint as ckpt
    from gpemsr_tpu.core.config import SegConfig, load_yaml
    from gpemsr_tpu.models.seg.mala import UNetMALA
    from gpemsr_tpu.seg.inference import evaluate_segmentation, load_labels

    data_fp = fp.ensure(DATA)
    cfg = load_yaml(os.path.join(ROOT, "configs", "seg_x16_mala.yml"),
                    SegConfig)
    seg_dir = os.path.join(SEG_RUNS, "seg_mala")
    payload = ckpt.restore(os.path.join(seg_dir, "checkpoints"))
    seg_step = int(payload.get("step", 0))
    variables = {"params": payload["params"]}
    if payload.get("batch_stats") is not None:   # MALA has no BN: key is None
        variables["batch_stats"] = payload["batch_stats"]
    model = UNetMALA(out_planes=cfg.model.output_nc,
                     if_sigmoid=cfg.model.if_sigmoid)

    # params as a jit ARGUMENT: MALA's ~84M params would otherwise serialize
    # into the compiled graph (HTTP 413 on remote-compile backends)
    def apply_fn(v, x):
        return model.apply(v, x)

    seg_id = {"steps": seg_step, "data_fingerprint": data_fp[:16]}

    from PIL import Image
    ids = sorted(int(os.path.splitext(f)[0]) for f in os.listdir(SR_DIR)
                 if f.endswith(".png"))
    labels = load_labels(os.path.join(DATA, "test", "labels.h5"),
                         test_split=len(ids))

    prev = {}
    if os.path.exists(rb.RESULTS):
        with open(rb.RESULTS) as f:
            prev = json.load(f)
    if prev.get("seg_net_mala") == seg_id and "seg_hr_mala" in prev:
        print("MALA HR oracle already recorded for this net + data draw")
    else:
        gt_dir = os.path.join(DATA, "test", "HR")
        vol_hr = np.stack(
            [np.asarray(Image.open(os.path.join(gt_dir, f"{i}.png")))
             for i in ids], 0).astype(np.float32)
        scores_hr = evaluate_segmentation(
            apply_fn, vol_hr, labels, cfg, params=variables,
            fetch_dtype=np.float16,
            out_dir=os.path.join(RUNS, "seg_eval_hr_mala"))
        if scores_hr.voi_sum > rb.HR_ORACLE_VOI_GATE:
            raise RuntimeError(
                f"MALA HR-oracle VOI {scores_hr.voi_sum:.3f} > gate "
                f"{rb.HR_ORACLE_VOI_GATE}: the protocol MALA net (step "
                f"{seg_step}) did not learn membranes on this data draw — "
                f"refusing to record protocol numbers.")
        record("seg_net_mala", seg_id)
        record("seg_hr_mala", {"voi_split": round(scores_hr.voi_split, 4),
                               "voi_merge": round(scores_hr.voi_merge, 4),
                               "voi_sum": round(scores_hr.voi_sum, 4),
                               "arand": round(scores_hr.arand, 4)})

    vol = np.stack([np.asarray(Image.open(
        os.path.join(SR_DIR, f"{i}.png"))) for i in ids], 0).astype(np.float32)
    scores = evaluate_segmentation(apply_fn, vol, labels, cfg,
                                   params=variables, fetch_dtype=np.float16,
                                   out_dir=os.path.join(RUNS, "seg_eval_mala"))
    record("seg_sr_mala", {"voi_split": round(scores.voi_split, 4),
                           "voi_merge": round(scores.voi_merge, 4),
                           "voi_sum": round(scores.voi_sum, 4),
                           "arand": round(scores.arand, 4),
                           "infer_time_s": round(scores.inference_time, 1)})


def main():
    phase = "all"
    for a in sys.argv[1:]:
        if a.startswith("--phase"):
            phase = a.split("=")[1] if "=" in a else sys.argv[
                sys.argv.index(a) + 1]
    if phase in ("all", "train"):
        train_mala_net()
    if phase in ("all", "seg"):
        seg_eval()


if __name__ == "__main__":
    main()
