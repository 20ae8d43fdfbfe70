"""Derive the x8 LR mirrors of an existing synthetic-EM draw.

The generator (make_synthetic_em.py) emits HR + x16 LR; the x8 pipeline
(run_baseline_x8.py, configs/baseline_stage{2,3}_x8.yml) additionally needs
LR8 / LRF8 / val/LR8 / test/LR8 — the same MATLAB-bicubic downsample at
scale 8 (data/util.py:385-521 semantics via data/resize.py). Derivation is
purely a function of the HR PNGs, so it cannot drift the draw: the content
fingerprint (scripts/fingerprint_dataset.py) covers HR, and these mirrors
are reproducible from it.

Usage: python scripts/derive_lr8.py [--data dataset/synth]
"""

from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np
from PIL import Image

from gpemsr_tpu.data.resize import imresize_np


def make_lr(img_u8, scale=8):
    lr = imresize_np(img_u8.astype(np.float32) / 255.0, 1.0 / scale)
    return np.clip(np.round(lr * 255.0), 0, 255).astype(np.uint8)


def mirror_tree(src_root, dst_root, scale=8):
    n = 0
    for dirpath, _dirs, files in os.walk(src_root):
        rel = os.path.relpath(dirpath, src_root)
        for f in sorted(files):
            if not f.endswith(".png"):
                continue
            dst_dir = os.path.join(dst_root, rel) if rel != "." else dst_root
            dst = os.path.join(dst_dir, f)
            if os.path.exists(dst):
                continue
            img = np.asarray(Image.open(os.path.join(dirpath, f)))
            os.makedirs(dst_dir, exist_ok=True)
            Image.fromarray(make_lr(img, scale)).save(dst)
            n += 1
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default=os.path.join(ROOT, "dataset", "synth"))
    args = p.parse_args()
    d = args.data
    for src, dst in ((os.path.join(d, "HR"), os.path.join(d, "LR8")),
                     (os.path.join(d, "HRF"), os.path.join(d, "LRF8")),
                     (os.path.join(d, "val", "HR"),
                      os.path.join(d, "val", "LR8")),
                     (os.path.join(d, "test", "HR"),
                      os.path.join(d, "test", "LR8"))):
        n = mirror_tree(src, dst)
        print(f"{dst}: wrote {n} sections")


if __name__ == "__main__":
    main()
