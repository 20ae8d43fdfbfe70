"""x8 self-trained baseline: stages 2-3 at scale 8 on the synthetic EM stack,
reusing the x16 baseline's stage-1 VQGAN (HR-patch training is
scale-independent), then streaming SR export + PSNR/SSIM + the seg protocol.

    python scripts/run_baseline_x8.py
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from gpemsr_tpu.core.platform import init_platform  # noqa: E402

init_platform()

DATA = os.path.join(ROOT, "dataset", "synth")
# GPEMSR_BASELINE_SUFFIX="_v3" selects configs/baseline_*_x8_v3.yml, roots
# runs under runs/baseline_v3 (reusing its stage-1), and writes SR sections
# to test/SR_v3/x8 — same convention as run_baseline.py.
SUFFIX = os.environ.get("GPEMSR_BASELINE_SUFFIX", "")
RUNS = os.path.join(ROOT, "runs", "baseline" + SUFFIX)
SEG_RUNS = os.path.join(ROOT, "runs", "baseline")   # protocol seg net (HR)
SR_DIR = os.path.join(DATA, "test", "SR" + SUFFIX, "x8")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import run_baseline as rb  # noqa: E402
from run_baseline import ckpt_done, record, sh  # noqa: E402

# share the x16 pipeline's results file + skip logic for this suffix
rb.RUNS = RUNS
rb.RESULTS = os.path.join(RUNS, "RESULTS.json")


def train_stages():
    if not ckpt_done("baseline_stage2_x8", f"baseline_stage2_x8{SUFFIX}.yml"):
        sh([sys.executable, "train_stage2.py",
            "-opt", f"configs/baseline_stage2_x8{SUFFIX}.yml",
            "--stage1-ckpt", os.path.join(RUNS, "baseline_stage1",
                                          "checkpoints")])
    if not ckpt_done("baseline_stage3_x8", f"baseline_stage3_x8{SUFFIX}.yml"):
        sh([sys.executable, "train_stage3.py",
            "-opt", f"configs/baseline_stage3_x8{SUFFIX}.yml",
            "--prior-ckpt", os.path.join(RUNS, "baseline_stage2_x8",
                                         "checkpoints")])


def export_sr():
    import numpy as np

    from gpemsr_tpu.core import checkpoint as ckpt
    from gpemsr_tpu.core.config import ExperimentConfig, load_yaml

    if os.path.isdir(SR_DIR) and len(os.listdir(SR_DIR)) >= 48:
        print("x8 SR already exported")
    else:
        from gpemsr_tpu.infer.sr import sr_stack_streaming
        from gpemsr_tpu.models.gpemsr import GPEMSR
        from gpemsr_tpu.train.common import merge_params
        from gpemsr_tpu.utils.image import read_img

        cfg = load_yaml(os.path.join(ROOT, "configs",
                                     f"baseline_stage3_x8{SUFFIX}.yml"),
                        ExperimentConfig)
        payload = ckpt.restore(os.path.join(RUNS, "baseline_stage3_x8",
                                            "checkpoints"))
        model_frozen = {k: v for k, v in payload["frozen"].items()
                        if k != "cx_vgg"}
        params = {"params": merge_params(payload["params"], model_frozen)}
        model = GPEMSR(cfg.network)
        lr_dir = os.path.join(DATA, "test", "LR8")
        ids = sorted(int(os.path.splitext(f)[0]) for f in os.listdir(lr_dir)
                     if f.endswith(".png"))
        stack = np.stack([read_img(os.path.join(lr_dir, f"{i}.png"))
                          for i in ids], 0)
        sr_stack_streaming(model, params, stack, out_dir=SR_DIR)
        print(f"wrote {stack.shape[0]} x8 SR sections")

    from PIL import Image

    from gpemsr_tpu.utils.metrics import calculate_psnr, calculate_ssim
    ps, ss = [], []
    gt_dir = os.path.join(DATA, "test", "HR")
    for f in sorted(os.listdir(SR_DIR)):
        if not f.endswith(".png"):
            continue
        sr = np.asarray(Image.open(os.path.join(SR_DIR, f)))
        gt = np.asarray(Image.open(os.path.join(gt_dir, f)))
        ps.append(calculate_psnr(sr, gt))
        ss.append(calculate_ssim(sr, gt))
    record("sr_psnr_x8", round(float(np.mean(ps)), 4))
    record("sr_ssim_x8", round(float(np.mean(ss)), 5))

    # bicubic floor at x8 for context (same role as bicubic_psnr at x16)
    from gpemsr_tpu.data.resize import imresize_np
    ps = []
    lr_dir = os.path.join(DATA, "test", "LR8")
    for f in sorted(os.listdir(lr_dir)):
        if not f.endswith(".png"):
            continue
        lr = np.asarray(Image.open(os.path.join(lr_dir, f))).astype(np.float32)
        up = imresize_np(lr / 255.0, 8.0)
        up = np.clip(np.round(up * 255), 0, 255).astype(np.uint8)
        gt = np.asarray(Image.open(os.path.join(gt_dir, f)))
        ps.append(calculate_psnr(up, gt))
    record("bicubic_psnr_x8", round(float(np.mean(ps)), 4))


def seg_eval():
    import numpy as np

    import jax

    from gpemsr_tpu.core import checkpoint as ckpt
    from gpemsr_tpu.core.config import SegConfig, load_yaml
    from gpemsr_tpu.models.seg.superhuman import UNetSuperhuman
    from gpemsr_tpu.seg.inference import evaluate_segmentation, load_labels

    # the protocol seg net is trained on HR only (scale-independent); the
    # x16 pipeline (run_baseline.py::seg_eval) must already have recorded a
    # passing HR-oracle gate for this net + draw before x8 numbers count
    import json
    with open(rb.RESULTS) as f:
        res = json.load(f)
    if "seg_hr" not in res:
        raise RuntimeError(
            "no HR-oracle record in RESULTS.json — run the x16 seg phase "
            "(run_baseline.py --phase seg) first; its VOI gate qualifies "
            "the protocol seg net this x8 eval reuses")
    cfg = load_yaml(os.path.join(ROOT, "configs", "seg_x8_superhuman.yml"),
                    SegConfig)
    payload = ckpt.restore(os.path.join(SEG_RUNS, "seg_superhuman",
                                        "checkpoints"))
    variables = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"]}
    model = UNetSuperhuman(filters=tuple(cfg.model.filters),
                           out_planes=cfg.model.output_nc,
                           if_sigmoid=cfg.model.if_sigmoid)
    apply_fn = jax.jit(lambda x: model.apply(variables, x))

    from PIL import Image
    ids = sorted(int(os.path.splitext(f)[0]) for f in os.listdir(SR_DIR)
                 if f.endswith(".png"))
    vol = np.stack([np.asarray(Image.open(
        os.path.join(SR_DIR, f"{i}.png"))) for i in ids], 0).astype(np.float32)
    labels = load_labels(os.path.join(DATA, "test", "labels.h5"),
                         test_split=vol.shape[0])
    scores = evaluate_segmentation(apply_fn, vol, labels, cfg,
                                   out_dir=os.path.join(RUNS, "seg_eval_x8"))
    record("seg_sr_x8", {"voi_split": round(scores.voi_split, 4),
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
        train_stages()
    if phase in ("all", "sr"):
        export_sr()
    if phase in ("all", "seg"):
        seg_eval()


if __name__ == "__main__":
    main()
