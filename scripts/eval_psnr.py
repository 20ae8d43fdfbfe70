"""Standalone PSNR/SSIM evaluation between two PNG directories.

The reference computes PSNR at validation time (util/util.py:253, uint8
[0,255] protocol) and defines MATLAB-equivalent SSIM; this tool runs that
protocol over an SR output directory vs ground truth:
    python scripts/eval_psnr.py SR_DIR GT_DIR [--ssim]"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from gpemsr_tpu.utils.metrics import calculate_psnr, calculate_ssim


def main():
    p = argparse.ArgumentParser()
    p.add_argument("sr_dir")
    p.add_argument("gt_dir")
    p.add_argument("--ssim", action="store_true")
    args = p.parse_args()

    names = sorted(f for f in os.listdir(args.sr_dir) if f.endswith(".png"))
    psnrs, ssims = [], []
    for n in names:
        sr = np.asarray(Image.open(os.path.join(args.sr_dir, n)))
        gt = np.asarray(Image.open(os.path.join(args.gt_dir, n)))
        psnrs.append(calculate_psnr(sr, gt))
        if args.ssim:
            ssims.append(calculate_ssim(sr, gt))
    print(f"{len(names)} images  PSNR avg: {np.mean(psnrs):.4f}"
          + (f"  SSIM avg: {np.mean(ssims):.5f}" if args.ssim else ""))


if __name__ == "__main__":
    main()
