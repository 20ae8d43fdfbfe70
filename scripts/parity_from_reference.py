"""One-command parity harness for RELEASED reference checkpoints (VERDICT #8).

No pretrained reference weights exist in this environment, so converted-weight
parity vs the paper checkpoints is structurally unverifiable today; this
script is the ready-to-run harness for the day they are obtainable:

  python scripts/parity_from_reference.py \
      --stage3 stage3_x16.pth --scale 16 \
      --lr-dir dataset/CREMI/test/LR --hr-dir dataset/CREMI/test/HR \
      [--seg-ckpt superhuman.pt --seg-model superhuman \
       --seg-config configs/seg_x16_superhuman.yml --labels labels.h5] \
      [--out-dir runs/parity]

It (1) converts the reference stage-3 GPEMSR state_dict (model/GPEMSR.py
layout, 'module.' prefixes stripped — output_GPEMSR.py:52 load protocol),
(2) runs the streaming x-scale SR export over the LR stack, (3) reports
PSNR/SSIM vs HR (util/util.py:253,263 protocol), and (4) optionally converts
a reference seg checkpoint (inference_seg.py:98-105 load protocol) and runs
the full tiled-affinity -> watershed -> waterz -> VOI/ARAND protocol.

`--dry-run` exercises the entire harness against the repo's torch-oracle
fixtures (tests/test_full_parity.py): it builds a tiny reference-layout
GPEMSR checkpoint, saves it as a real .pth, converts it back, checks the
converted forward is bit-close (2e-3) to the torch oracle, and drives the
SR export + PSNR path end-to-end — green today, so the harness is known-good
before real weights arrive.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def load_torch_sd(path):
    import torch
    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model_weights" in sd:   # seg ckpt layout
        sd = sd["model_weights"]
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def run_sr(stage3_pth, scale, lr_dir, hr_dir, out_dir, cfg=None):
    import jax
    import jax.numpy as jnp  # noqa: F401
    from PIL import Image

    from gpemsr_tpu.core.config import GPEMSRConfig
    from gpemsr_tpu.infer.sr import sr_stack_streaming
    from gpemsr_tpu.models import convert as cv
    from gpemsr_tpu.models.gpemsr import GPEMSR
    from gpemsr_tpu.utils.metrics import calculate_psnr, calculate_ssim
    from gpemsr_tpu.utils.image import read_img

    sd = load_torch_sd(stage3_pth)
    cfg = cfg or GPEMSRConfig(scale=scale)
    params = {"params": cv.convert_gpemsr(sd, cfg)}
    model = GPEMSR(cfg)

    ids = sorted(int(os.path.splitext(f)[0]) for f in os.listdir(lr_dir)
                 if f.endswith(".png"))
    stack = np.stack([read_img(os.path.join(lr_dir, f"{i}.png"))
                      for i in ids], 0)
    sr_out = os.path.join(out_dir, f"SR_x{cfg.scale}")
    sr_stack_streaming(model, params, stack, out_dir=sr_out)

    ps, ss = [], []
    for i in ids:
        sr = np.asarray(Image.open(os.path.join(sr_out, f"{i}.png")))
        gt = np.asarray(Image.open(os.path.join(hr_dir, f"{i}.png")))
        ps.append(calculate_psnr(sr, gt))
        ss.append(calculate_ssim(sr, gt))
    return {"sr_dir": sr_out, "psnr": float(np.mean(ps)),
            "ssim": float(np.mean(ss)), "n_sections": len(ids)}


def run_seg(seg_ckpt, seg_model, seg_config, labels_h5, sr_dir, out_dir):
    import jax

    from gpemsr_tpu.core.config import SegConfig, load_yaml
    from gpemsr_tpu.models import convert as cv
    from gpemsr_tpu.seg.inference import evaluate_segmentation, load_labels
    from PIL import Image

    cfg = load_yaml(seg_config, SegConfig)
    sd = load_torch_sd(seg_ckpt)
    if seg_model == "superhuman":
        from gpemsr_tpu.models.seg.superhuman import UNetSuperhuman
        variables = cv.convert_superhuman(sd)
        model = UNetSuperhuman(filters=tuple(cfg.model.filters),
                               out_planes=cfg.model.output_nc,
                               if_sigmoid=cfg.model.if_sigmoid)
    else:
        from gpemsr_tpu.models.seg.mala import UNetMALA
        variables = cv.convert_mala(sd)
        model = UNetMALA(if_sigmoid=cfg.model.if_sigmoid)
    apply_fn = jax.jit(lambda v, x: model.apply(v, x))

    ids = sorted(int(os.path.splitext(f)[0]) for f in os.listdir(sr_dir)
                 if f.endswith(".png"))
    vol = np.stack([np.asarray(Image.open(os.path.join(sr_dir, f"{i}.png")))
                    for i in ids], 0).astype(np.float32)
    labels = load_labels(labels_h5, test_split=vol.shape[0])
    scores = evaluate_segmentation(apply_fn, vol, labels, cfg,
                                   out_dir=os.path.join(out_dir, "seg_eval"),
                                   params=variables)
    return {"voi_split": scores.voi_split, "voi_merge": scores.voi_merge,
            "voi_sum": scores.voi_sum, "arand": scores.arand}


def dry_run(out_dir):
    """Drive the full harness against the repo's torch-oracle fixtures."""
    from gpemsr_tpu.parallel.mesh import ensure_cpu_devices
    ensure_cpu_devices(1)

    import torch
    import jax.numpy as jnp
    from PIL import Image

    from tests.test_full_parity import TGPEMSR, _oracle_state_dict, NF, G
    from tests.test_models import tiny_prior
    from gpemsr_tpu.core.config import GPEMSRConfig
    from gpemsr_tpu.models import convert as cv
    from gpemsr_tpu.models.gpemsr import GPEMSR

    torch.manual_seed(11)
    rng = np.random.default_rng(0)
    prior = tiny_prior(16)
    tm = TGPEMSR(prior).eval()
    pth = os.path.join(out_dir, "oracle_stage3.pth")
    os.makedirs(out_dir, exist_ok=True)
    torch.save(_oracle_state_dict(tm), pth)
    cfg = GPEMSRConfig(nf=NF, groups=G, front_RBs=1, back_RBs=1,
                       ref_fusion_feat_RBs=1, scale=16, prior=prior)

    # conversion parity on one window vs the torch oracle
    sd = load_torch_sd(pth)
    params = {"params": cv.convert_gpemsr(sd, cfg)}
    x = rng.uniform(0, 1, (1, 5, 8, 8, 1)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 1, 4, 2, 3))).numpy()
    got = np.asarray(GPEMSR(cfg).apply(params, jnp.asarray(x))[0])
    err = np.abs(got.transpose(0, 3, 1, 2) - want).max()
    assert err < 2e-3, f"converted forward diverges from oracle: {err}"
    print(f"conversion parity OK (max |diff| {err:.2e} < 2e-3)")

    # tiny LR/HR stack through the real export + metric path
    lr_dir = os.path.join(out_dir, "LR")
    hr_dir = os.path.join(out_dir, "HR")
    os.makedirs(lr_dir, exist_ok=True)
    os.makedirs(hr_dir, exist_ok=True)
    for z in range(6):
        Image.fromarray(rng.integers(0, 255, (8, 8)).astype(np.uint8)).save(
            os.path.join(lr_dir, f"{z}.png"))
        Image.fromarray(rng.integers(0, 255, (128, 128)).astype(
            np.uint8)).save(os.path.join(hr_dir, f"{z}.png"))
    res = run_sr(pth, 16, lr_dir, hr_dir, out_dir, cfg=cfg)
    assert res["n_sections"] == 6 and np.isfinite(res["psnr"])
    print(f"SR export path OK: {res}")
    print("DRY RUN PASS — harness ready for released reference weights")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage3", help="reference stage3_x{8,16}.pth")
    p.add_argument("--scale", type=int, default=16, choices=(8, 16))
    p.add_argument("--lr-dir")
    p.add_argument("--hr-dir")
    p.add_argument("--seg-ckpt")
    p.add_argument("--seg-model", default="superhuman",
                   choices=("superhuman", "mala"))
    p.add_argument("--seg-config")
    p.add_argument("--labels")
    p.add_argument("--out-dir", default=os.path.join(ROOT, "runs", "parity"))
    p.add_argument("--psnr-tol", type=float, default=0.1,
                   help="max |PSNR - --expect-psnr| in dB")
    p.add_argument("--voi-tol", type=float, default=0.05)
    p.add_argument("--expect-psnr", type=float)
    p.add_argument("--expect-voi", type=float)
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()

    if args.dry_run:
        dry_run(os.path.join(args.out_dir, "dryrun"))
        return

    if not (args.stage3 and args.lr_dir and args.hr_dir):
        p.error("--stage3/--lr-dir/--hr-dir required (or --dry-run)")
    os.makedirs(args.out_dir, exist_ok=True)
    report = {"stage3": args.stage3, "scale": args.scale}
    res = run_sr(args.stage3, args.scale, args.lr_dir, args.hr_dir,
                 args.out_dir)
    report.update(res)
    if args.expect_psnr is not None:
        report["psnr_parity"] = bool(
            abs(res["psnr"] - args.expect_psnr) <= args.psnr_tol)
    if args.seg_ckpt:
        if not (args.seg_config and args.labels):
            p.error("--seg-config and --labels required with --seg-ckpt")
        seg = run_seg(args.seg_ckpt, args.seg_model, args.seg_config,
                      args.labels, res["sr_dir"], args.out_dir)
        report["seg"] = seg
        if args.expect_voi is not None:
            report["voi_parity"] = bool(
                abs(seg["voi_sum"] - args.expect_voi) <= args.voi_tol)
    out = os.path.join(args.out_dir, "parity_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
