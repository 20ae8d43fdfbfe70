"""Synthetic serial-section EM data generator for the self-trained baseline.

The environment ships no CREMI data and no pretrained weights (VERDICT #2 /
BASELINE.md), so the numeric baseline is instantiated on a procedurally
generated EM-like stack: a z-coherent 3-D supervoxel segmentation (warped
anisotropic Voronoi) rendered with dark membranes + per-segment texture —
giving HR sections for SR training AND ground-truth labels for the
watershed/waterz/VOI segmentation protocol (provider_valid.py:77-106 roles).

Outputs (under --out):
  HR/vol{k}/s0/%04d.png     stage-1/2 training tree (VQGAN_dataset layout)
  LR/vol{k}/s0/%04d.png     x{scale} MATLAB-bicubic LR mirror
  HRF/vol{k}/{z}.png        flat tree for CREMIDataset (stage 3)
  LRF/vol{k}/{z}.png        flat LR mirror
  val/HR, val/LR            held-out sections (flat)
  test/HR/{z}.png           evaluation volume HR sections
  test/LR/{z}.png           evaluation volume LR sections
  test/labels.h5            'main' uint32 labels for seg eval
  train_vqgan.txt           whitelist of training volumes
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy import ndimage


def smooth_noise(rng, shape, sigma, amplitude):
    f = rng.standard_normal(shape).astype(np.float32)
    f = ndimage.gaussian_filter(f, sigma)
    f /= max(np.abs(f).max(), 1e-8)
    return f * amplitude


def synth_labels(rng, Z, Y, X, n_seeds, z_aniso=6.0, warp_amp=14.0):
    """Warped anisotropic Voronoi supervoxels [Z, Y, X] uint32, ids >= 1."""
    wy = smooth_noise(rng, (Z, Y, X), (2, 24, 24), warp_amp)
    wx = smooth_noise(rng, (Z, Y, X), (2, 24, 24), warp_amp)
    zz, yy, xx = np.meshgrid(np.arange(Z, dtype=np.float32),
                             np.arange(Y, dtype=np.float32),
                             np.arange(X, dtype=np.float32), indexing="ij")
    yyw = yy + wy
    xxw = xx + wx
    seeds = np.stack([rng.uniform(0, Z, n_seeds),
                      rng.uniform(0, Y, n_seeds),
                      rng.uniform(0, X, n_seeds)], 1).astype(np.float32)
    best = np.full((Z, Y, X), np.inf, np.float32)
    lab = np.zeros((Z, Y, X), np.uint32)
    for i, (sz, sy, sx) in enumerate(seeds):
        d = ((zz - sz) * z_aniso) ** 2 + (yyw - sy) ** 2 + (xxw - sx) ** 2
        m = d < best
        best[m] = d[m]
        lab[m] = i + 1
    return lab


def render_em(rng, lab):
    """EM-like rendering: per-segment brightness, organelle blobs, texture,
    dark dilated membranes, slight per-z jitter."""
    Z, Y, X = lab.shape
    n = int(lab.max()) + 1
    base = rng.uniform(120, 205, n).astype(np.float32)
    img = base[lab]
    img += smooth_noise(rng, lab.shape, (0.8, 2.0, 2.0), 26.0)   # texture
    blobs = smooth_noise(rng, lab.shape, (1.5, 6, 6), 1.0)
    img = np.where(blobs > 0.55, img * 0.55, img)                # organelles

    mem = np.zeros(lab.shape, bool)
    mem[:, 1:, :] |= lab[:, 1:, :] != lab[:, :-1, :]
    mem[:, :, 1:] |= lab[:, :, 1:] != lab[:, :, :-1]
    for z in range(Z):
        mem[z] = ndimage.binary_dilation(mem[z], iterations=1)
    mem_soft = ndimage.gaussian_filter(
        mem.astype(np.float32), (0, 0.8, 0.8))
    memval = 40.0 + smooth_noise(rng, lab.shape, (0.8, 3, 3), 18.0)
    img = img * (1 - np.clip(mem_soft * 1.4, 0, 1)) \
        + memval * np.clip(mem_soft * 1.4, 0, 1)
    img += rng.uniform(-6, 6, (Z, 1, 1)).astype(np.float32)      # z jitter
    img += rng.standard_normal(lab.shape).astype(np.float32) * 3.0
    return np.clip(img, 0, 255).astype(np.uint8)


def save_png(arr, path):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def make_lr(img_u8, scale):
    from gpemsr_tpu.data.resize import imresize_np
    lr = imresize_np(img_u8.astype(np.float32) / 255.0, 1.0 / scale)
    return np.clip(np.round(lr * 255.0), 0, 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--scale", type=int, default=16)
    p.add_argument("--train-vols", type=int, default=2)
    p.add_argument("--train-z", type=int, default=40)
    p.add_argument("--train-hw", type=int, default=512)
    p.add_argument("--test-z", type=int, default=48)
    p.add_argument("--test-hw", type=int, default=512)
    p.add_argument("--val-z", type=int, default=8)
    p.add_argument("--seeds-per-kpx", type=float, default=0.35,
                   help="segments per 1000 px of section area")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train-only", action="store_true",
                   help="generate only additional training volumes (no "
                        "val/test/h5) and append them to train_vqgan.txt")
    p.add_argument("--vol-offset", type=int, default=0,
                   help="starting index for volume names (vol{k})")
    args = p.parse_args()

    if args.train_only and args.vol_offset == 0:
        p.error("--train-only requires --vol-offset > 0 (vol0 and the "
                "seg-net h5 volumes already exist; regenerating them would "
                "silently overwrite the baseline's training data)")

    import h5py

    rng = np.random.default_rng(args.seed)
    out = args.out
    names = []
    for k in range(args.vol_offset, args.vol_offset + args.train_vols):
        name = f"vol{k}"
        names.append(name)
        Z, S = args.train_z, args.train_hw
        n_seeds = max(8, int(args.seeds_per_kpx * S * S * Z / 1e6 * 6))
        lab = synth_labels(rng, Z, S, S, n_seeds)
        raw = render_em(rng, lab)
        for z in range(Z):
            lr = make_lr(raw[z], args.scale)
            save_png(raw[z], os.path.join(out, "HR", name, "s0", f"{z:04d}.png"))
            save_png(lr, os.path.join(out, "LR", name, "s0", f"{z:04d}.png"))
            save_png(raw[z], os.path.join(out, "HRF", name, f"{z}.png"))
            save_png(lr, os.path.join(out, "LRF", name, f"{z}.png"))
        if k == 0:
            # (raw, labels) training volume for the seg nets (train_seg.py)
            with h5py.File(os.path.join(out, "train_raw.h5"), "w") as f:
                f.create_dataset("main", data=raw, compression="gzip")
            with h5py.File(os.path.join(out, "train_labels.h5"), "w") as f:
                f.create_dataset("main", data=lab.astype(np.uint32),
                                 compression="gzip")
        print(f"{name}: {Z}x{S}x{S}, {n_seeds} segments", flush=True)

    if args.train_only:
        txt = os.path.join(out, "train_vqgan.txt")
        existing = []
        if os.path.exists(txt):
            with open(txt) as f:
                existing = [l.strip() for l in f if l.strip()]
        merged = existing + [n for n in names if n not in existing]
        with open(txt, "w") as f:
            f.write("\n".join(merged) + "\n")
        print(f"appended {names} -> {txt}")
        _write_fingerprint(out)
        return

    # held-out val sections (flat single-level tree, small crops for speed)
    Zv, Sv = args.val_z, min(args.train_hw, 256)
    lab = synth_labels(rng, Zv, Sv, Sv, max(6, int(0.35 * Sv * Sv / 1e3)))
    raw = render_em(rng, lab)
    for z in range(Zv):
        save_png(raw[z], os.path.join(out, "val", "HR", "volv", f"{z}.png"))
        save_png(make_lr(raw[z], args.scale),
                 os.path.join(out, "val", "LR", "volv", f"{z}.png"))

    # evaluation volume + labels
    Z, S = args.test_z, args.test_hw
    n_seeds = max(12, int(args.seeds_per_kpx * S * S * Z / 1e6 * 6))
    lab = synth_labels(rng, Z, S, S, n_seeds)
    raw = render_em(rng, lab)
    for z in range(Z):
        save_png(raw[z], os.path.join(out, "test", "HR", f"{z}.png"))
        save_png(make_lr(raw[z], args.scale),
                 os.path.join(out, "test", "LR", f"{z}.png"))
    os.makedirs(os.path.join(out, "test"), exist_ok=True)
    with h5py.File(os.path.join(out, "test", "labels.h5"), "w") as f:
        f.create_dataset("main", data=lab.astype(np.uint32),
                         compression="gzip")
    with open(os.path.join(out, "train_vqgan.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    _write_fingerprint(out)
    print(f"test: {Z}x{S}x{S}, {n_seeds} segments -> {out}")


def _write_fingerprint(out):
    """Content-hash the generated tree (VERDICT r4 #3: generation drifted
    across rounds because the generator code itself evolved — seed 0 is only
    deterministic per code version; the fingerprint makes any drift
    detectable instead of silent)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import fingerprint_dataset
    print("FINGERPRINT:", fingerprint_dataset.write(out))


if __name__ == "__main__":
    main()
