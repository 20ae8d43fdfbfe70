"""LR dataset generation: MATLAB-bicubic downscale of an HR PNG tree
(the preprocessing the reference's dataset layout implies; data/util.py:385).

    python scripts/make_lr.py HR_ROOT LR_ROOT --scale 16"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from gpemsr_tpu.data.resize import imresize_np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("hr_root")
    p.add_argument("lr_root")
    p.add_argument("--scale", type=int, default=16)
    args = p.parse_args()

    count = 0
    for dirpath, _, files in os.walk(args.hr_root):
        for f in files:
            if not f.endswith(".png"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, f), args.hr_root)
            dst = os.path.join(args.lr_root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            img = np.asarray(Image.open(os.path.join(dirpath, f))).astype(
                np.float32) / 255.0
            lr = imresize_np(img, 1.0 / args.scale)
            Image.fromarray(
                np.clip(lr * 255.0, 0, 255).round().astype(np.uint8)).save(dst)
            count += 1
    print(f"wrote {count} LR images to {args.lr_root}")


if __name__ == "__main__":
    main()
