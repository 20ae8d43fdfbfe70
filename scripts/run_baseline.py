"""Self-trained round-2 baseline pipeline (VERDICT #2/#5).

No CREMI data or pretrained weights exist in this environment, so the
numeric column of BASELINE.md is instantiated end-to-end on the synthetic EM
stack from scripts/make_synthetic_em.py:

  stage 1 -> stage 2 -> stage 3 (reduced schedules, configs/baseline_*.yml)
  -> streaming SR export of the test stack (output_GPEMSR.py protocol)
  -> PSNR / SSIM vs HR ground truth (util/util.py:253,263 protocol)
  -> superhuman seg training (train_seg.py) on the HR train volume
  -> full tiled-affinity -> watershed -> waterz -> VOI/ARAND protocol
     on the SR volume (inference_seg.py:108-167 roles)

Each phase is skipped when its artifact already exists, so the script is
resumable. Results are appended to runs/baseline/RESULTS.json; BASELINE.md
is updated by hand from that.

Usage: python scripts/run_baseline.py [--phase all|sr|seg]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from gpemsr_tpu.core.platform import init_platform  # noqa: E402

init_platform()     # persistent compile cache for the in-process phases
from scripts import fingerprint_dataset as fp  # noqa: E402

DATA = os.path.join(ROOT, "dataset", "synth")
# GPEMSR_BASELINE_SUFFIX="_v2" selects configs/baseline_*_v2.yml, writes to
# runs/baseline_v2 and dataset/.../SR_v2, and reuses the suffixless run's
# protocol seg net (trained on HR only — independent of the SR under test).
SUFFIX = os.environ.get("GPEMSR_BASELINE_SUFFIX", "")
RUNS = os.path.join(ROOT, "runs", "baseline" + SUFFIX)
SEG_RUNS = os.path.join(ROOT, "runs", "baseline")
SR_DIR = os.path.join(DATA, "test", "SR" + SUFFIX, "x16")
RESULTS = os.path.join(RUNS, "RESULTS.json")


def sh(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=ROOT)


def ckpt_done(name, stage_cfg=None):
    """A stage is done only when its latest checkpoint reached niter.

    Earlier this returned True on ANY checkpoint, so a stage interrupted
    mid-run (e.g. the session hosting it dying) was silently skipped on the
    next pipeline invocation and downstream stages trained from a partial
    prior. The trainers themselves resume-from-latest, so re-invoking an
    unfinished stage continues it rather than restarting.
    """
    d = os.path.join(RUNS, name, "checkpoints")
    if not (os.path.isdir(d) and any(f.startswith("step_")
                                     for f in os.listdir(d))):
        return False
    if stage_cfg is None:
        return True
    import yaml
    with open(os.path.join(ROOT, "configs", stage_cfg)) as f:
        niter = yaml.safe_load(f)["train"]["niter"]
    from gpemsr_tpu.core import checkpoint as ckpt
    latest = ckpt.latest_step(d)
    if latest is not None and latest < niter:
        print(f"{name}: checkpoint @{latest} < niter {niter} — resuming",
              flush=True)
        return False
    return True


def record(key, value):
    os.makedirs(RUNS, exist_ok=True)
    cur = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            cur = json.load(f)
    cur[key] = value
    with open(RESULTS, "w") as f:
        json.dump(cur, f, indent=2)
    print(f"RESULTS[{key}] = {value}", flush=True)


def train_stages():
    if not ckpt_done("baseline_stage1", f"baseline_stage1{SUFFIX}.yml"):
        sh([sys.executable, "train_stage1.py",
            "-opt", f"configs/baseline_stage1{SUFFIX}.yml"])
    if not ckpt_done("baseline_stage2", f"baseline_stage2{SUFFIX}.yml"):
        sh([sys.executable, "train_stage2.py",
            "-opt", f"configs/baseline_stage2{SUFFIX}.yml",
            "--stage1-ckpt", os.path.join(RUNS, "baseline_stage1",
                                          "checkpoints")])
    if not ckpt_done("baseline_stage3", f"baseline_stage3{SUFFIX}.yml"):
        sh([sys.executable, "train_stage3.py",
            "-opt", f"configs/baseline_stage3{SUFFIX}.yml",
            "--prior-ckpt", os.path.join(RUNS, "baseline_stage2",
                                         "checkpoints")])


def export_sr():
    import numpy as np

    from gpemsr_tpu.core import checkpoint as ckpt
    from gpemsr_tpu.core.config import GPEMSRConfig, load_yaml, ExperimentConfig

    if os.path.isdir(SR_DIR) and len(os.listdir(SR_DIR)) >= 48:
        print("SR already exported")
    else:
        import jax
        from gpemsr_tpu.infer.sr import sr_stack_streaming
        from gpemsr_tpu.models.gpemsr import GPEMSR
        from gpemsr_tpu.train.common import merge_params
        from gpemsr_tpu.utils.image import read_img

        cfg = load_yaml(os.path.join(ROOT, "configs",
                                     f"baseline_stage3{SUFFIX}.yml"),
                        ExperimentConfig)
        payload = ckpt.restore(os.path.join(RUNS, "baseline_stage3",
                                            "checkpoints"))
        model_frozen = {k: v for k, v in payload["frozen"].items()
                        if k != "cx_vgg"}
        params = {"params": merge_params(payload["params"], model_frozen)}
        model = GPEMSR(cfg.network)
        lr_dir = os.path.join(DATA, "test", "LR")
        ids = sorted(int(os.path.splitext(f)[0]) for f in os.listdir(lr_dir)
                     if f.endswith(".png"))
        stack = np.stack([read_img(os.path.join(lr_dir, f"{i}.png"))
                          for i in ids], 0)
        sr_stack_streaming(model, params, stack, out_dir=SR_DIR)
        print(f"wrote {stack.shape[0]} SR sections")

    # PSNR / SSIM vs HR
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
    record("sr_psnr", round(float(np.mean(ps)), 4))
    record("sr_ssim", round(float(np.mean(ss)), 5))

    # bicubic reference point for context
    from gpemsr_tpu.data.resize import imresize_np
    ps = []
    lr_dir = os.path.join(DATA, "test", "LR")
    for f in sorted(os.listdir(lr_dir)):
        if not f.endswith(".png"):
            continue
        lr = np.asarray(Image.open(os.path.join(lr_dir, f))).astype(np.float32)
        up = imresize_np(lr / 255.0, 16.0)
        up = np.clip(np.round(up * 255), 0, 255).astype(np.uint8)
        gt = np.asarray(Image.open(os.path.join(gt_dir, f)))
        ps.append(calculate_psnr(up, gt))
    record("bicubic_psnr", round(float(np.mean(ps)), 4))


SEG_STEPS = int(os.environ.get("GPEMSR_SEG_STEPS", "6000"))


def train_seg_net():
    """Train (or resume) the protocol seg net, keyed on the DATA fingerprint.

    r4 failure mode (VERDICT weak #2/#3): skip logic was existence-keyed, so
    a net trained on a previous data draw could silently score the protocol;
    and the 1500-step schedule that sufficed on the old draw collapsed on the
    new one (affinity mean 0.978) with no recorded loss curve. Now: the run
    dir records the fingerprint of the data it was trained on; any mismatch
    archives the stale net and retrains; schedule is 6000 steps with
    metrics.jsonl; seg_eval() gates on the HR-oracle VOI before recording."""
    data_fp = fp.ensure(DATA)
    out = os.path.join(SEG_RUNS, "seg_superhuman")
    fp_file = os.path.join(out, "DATA_FINGERPRINT")
    trained_fp = None
    if os.path.exists(fp_file):
        with open(fp_file) as f:
            trained_fp = f.read().split()[0]
    have_ckpt = os.path.isdir(os.path.join(out, "checkpoints")) and \
        os.listdir(os.path.join(out, "checkpoints"))
    if have_ckpt and trained_fp != data_fp:
        from gpemsr_tpu.core.logging import mkdir_and_rename
        print(f"seg net was trained on a different data draw "
              f"({(trained_fp or 'unrecorded')[:12]} != {data_fp[:12]}) — "
              f"archiving and retraining", flush=True)
        mkdir_and_rename(out)
        have_ckpt = False
    from gpemsr_tpu.core import checkpoint as ckpt
    if have_ckpt and (ckpt.latest_step(os.path.join(out, "checkpoints"))
                      or 0) >= SEG_STEPS:
        print("seg net already trained (fingerprint match)")
        return
    # record the fingerprint BEFORE training: train_seg resumes from its
    # latest checkpoint, so a killed run must keep its draw attribution or
    # the next invocation mis-archives the partial net as a stale draw
    # (this happened: an OOM kill at step 5000/6000 cost the whole run)
    os.makedirs(out, exist_ok=True)
    with open(fp_file, "w") as f:
        f.write(data_fp + "\n")
    sh([sys.executable, "train_seg.py",
        "-c", "configs/seg_x16_superhuman.yml",
        "--raw", os.path.join(DATA, "train_raw.h5"),
        "--labels", os.path.join(DATA, "train_labels.h5"),
        "--steps", str(SEG_STEPS), "--batch", "2", "--out", out,
        "--save-every", "1000"])


HR_ORACLE_VOI_GATE = float(os.environ.get("GPEMSR_HR_VOI_GATE", "1.5"))


def seg_eval():
    """HR-oracle FIRST with a sanity gate, then seg-on-SR.

    r4 recorded a seg-on-SR number from a collapsed net (HR-oracle VOI 3.11,
    affinity mean 0.978) with nothing flagging it. The HR oracle measures
    only the seg net (no SR involved); if it is worse than the gate the net
    did not learn membranes and ALL protocol numbers from it are garbage —
    abort instead of recording."""
    import numpy as np

    import jax

    from gpemsr_tpu.core import checkpoint as ckpt
    from gpemsr_tpu.core.config import SegConfig, load_yaml
    from gpemsr_tpu.models.seg.superhuman import UNetSuperhuman
    from gpemsr_tpu.seg.inference import evaluate_segmentation, load_labels

    data_fp = fp.ensure(DATA)
    cfg = load_yaml(os.path.join(ROOT, "configs", "seg_x16_superhuman.yml"),
                    SegConfig)
    seg_dir = os.path.join(SEG_RUNS, "seg_superhuman")
    payload = ckpt.restore(os.path.join(seg_dir, "checkpoints"))
    seg_step = int(payload.get("step", 0))
    variables = {"params": payload["params"]}
    if "batch_stats" in payload:
        variables["batch_stats"] = payload["batch_stats"]
    model = UNetSuperhuman(filters=tuple(cfg.model.filters),
                           out_planes=cfg.model.output_nc,
                           if_sigmoid=cfg.model.if_sigmoid)
    apply_fn = jax.jit(lambda x: model.apply(variables, x))
    seg_id = {"steps": seg_step, "data_fingerprint": data_fp[:16]}

    from PIL import Image
    ids = sorted(int(os.path.splitext(f)[0]) for f in os.listdir(SR_DIR)
                 if f.endswith(".png"))
    labels = load_labels(os.path.join(DATA, "test", "labels.h5"),
                         test_split=len(ids))

    # ---- HR oracle (gate) ----
    prev = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            prev = json.load(f)
    if prev.get("seg_net") == seg_id and "seg_hr" in prev:
        print("HR oracle already recorded for this net + data draw")
    else:
        gt_dir = os.path.join(DATA, "test", "HR")
        vol_hr = np.stack(
            [np.asarray(Image.open(os.path.join(gt_dir, f"{i}.png")))
             for i in ids], 0).astype(np.float32)
        scores_hr = evaluate_segmentation(apply_fn, vol_hr, labels, cfg,
                                          out_dir=os.path.join(RUNS,
                                                               "seg_eval_hr"))
        if scores_hr.voi_sum > HR_ORACLE_VOI_GATE:
            raise RuntimeError(
                f"HR-oracle VOI {scores_hr.voi_sum:.3f} > gate "
                f"{HR_ORACLE_VOI_GATE}: the protocol seg net (step "
                f"{seg_step}) did not learn membranes on this data draw — "
                f"refusing to record protocol numbers. Inspect "
                f"{seg_dir}/metrics.jsonl and retrain.")
        record("seg_net", seg_id)
        record("seg_hr", {"voi_split": round(scores_hr.voi_split, 4),
                          "voi_merge": round(scores_hr.voi_merge, 4),
                          "voi_sum": round(scores_hr.voi_sum, 4),
                          "arand": round(scores_hr.arand, 4)})

    # ---- seg on SR ----
    vol = np.stack([np.asarray(Image.open(
        os.path.join(SR_DIR, f"{i}.png"))) for i in ids], 0).astype(np.float32)
    scores = evaluate_segmentation(apply_fn, vol, labels, cfg,
                                   out_dir=os.path.join(RUNS, "seg_eval"),
                                   show=True)
    record("seg_sr", {"voi_split": round(scores.voi_split, 4),
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
    # cross-draw contamination guard: every artifact in RUNS must descend
    # from ONE data draw. If the dataset changed under an existing results
    # file, refuse to mix numbers (VERDICT r4 #3).
    data_fp = fp.ensure(DATA)
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            rec_fp = json.load(f).get("data_fingerprint")
        if rec_fp is not None and rec_fp != data_fp[:16]:
            raise RuntimeError(
                f"dataset fingerprint {data_fp[:16]} != the draw RESULTS.json "
                f"was computed on ({rec_fp}); archive {RUNS} (or regenerate "
                f"the original draw) before re-running")
    record("data_fingerprint", data_fp[:16])
    if phase in ("all", "train"):
        train_stages()
    if phase in ("all", "sr"):
        export_sr()
    if phase in ("all", "seg"):
        train_seg_net()
        seg_eval()


if __name__ == "__main__":
    main()
