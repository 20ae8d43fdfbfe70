"""Segmentation visualisation (reference inference_code/utils/show.py:316-336):
random-color label rendering and raw-image colorisation for result galleries."""

from __future__ import annotations

import numpy as np


def draw_fragments_3d(seg: np.ndarray, seed: int = 0) -> np.ndarray:
    """uint labels [Z, Y, X] -> RGB uint8 [Z, Y, X, 3], random color per id,
    background (0) black."""
    rng = np.random.default_rng(seed)
    uid = np.unique(seg)
    mx = int(uid.max()) if uid.size else 0
    lut = rng.integers(0, 256, (mx + 1, 3), dtype=np.uint8)
    lut[0] = 0
    return lut[seg.astype(np.int64)]


def draw_raw_image(raw: np.ndarray) -> np.ndarray:
    """Grayscale volume [Z, Y, X] (0..255) -> RGB uint8."""
    r = np.clip(raw, 0, 255).astype(np.uint8)
    return np.stack([r, r, r], axis=-1)


def affinity_gallery(pred_affs: np.ndarray, gt_affs: np.ndarray):
    """Per-slice side-by-side affinity panels (inference_seg.py:174-183):
    yields (z, uint8 image) with pred channels on top, gt below."""
    p = (np.clip(pred_affs, 0, 1) * 255).astype(np.uint8)
    g = (np.clip(gt_affs, 0, 1) * 255).astype(np.uint8)
    for z in range(p.shape[1]):
        top = np.concatenate([p[0, z], p[1, z], p[2, z]], axis=1)
        bot = np.concatenate([g[0, z], g[1, z], g[2, z]], axis=1)
        yield z, np.concatenate([top, bot], axis=0)


def training_panel(inputs: np.ndarray, pred: np.ndarray,
                   target: np.ndarray) -> np.ndarray:
    """Training-debug panel (the show_affs / training_show family,
    show.py:80-205): center-z slice of raw input | per-channel prediction |
    per-channel target, one row, uint8. inputs [D,H,W] or [D,H,W,1] in
    [0,1] or [0,255]; pred/target [C,D,H,W] or [D,H,W,C] in [0,1]."""
    def mid_gray(v):
        v = np.asarray(v, np.float32)
        if v.ndim == 4:
            v = v[..., 0]
        if v.max() <= 1.0:
            v = v * 255.0
        return np.clip(v[v.shape[0] // 2], 0, 255).astype(np.uint8)

    def chans(v):
        v = np.asarray(v, np.float32)
        if v.ndim == 4 and v.shape[-1] <= 4:        # DHWC -> CDHW
            v = np.moveaxis(v, -1, 0)
        z = v.shape[1] // 2
        return [np.clip(v[c, z] * 255, 0, 255).astype(np.uint8)
                for c in range(v.shape[0])]

    cells = [mid_gray(inputs)] + chans(pred) + chans(target)
    return np.concatenate(cells, axis=1)


def overlay_fragments(raw: np.ndarray, seg: np.ndarray, alpha: float = 0.3,
                      seed: int = 0) -> np.ndarray:
    """Color labels alpha-blended over the raw volume
    (seeds_func.py:115-143 draw_fragments role): raw [Z,Y,X] 0..255,
    seg [Z,Y,X] uint -> RGB uint8 [Z,Y,X,3]. Background keeps the raw."""
    color = draw_fragments_3d(seg, seed=seed).astype(np.float32)
    base = draw_raw_image(raw).astype(np.float32)
    fg = (seg > 0)[..., None]
    out = np.where(fg, (1 - alpha) * base + alpha * color, base)
    return np.clip(out, 0, 255).astype(np.uint8)


def draw_seeds(raw: np.ndarray, seeds: np.ndarray,
               radius: int = 1) -> np.ndarray:
    """Seed markers over a raw slice (seeds_func.py:153-170): raw [Y,X]
    0..255, seeds [Y,X] uint (nonzero = seed) -> RGB uint8 with red dots."""
    img = np.stack([np.clip(raw, 0, 255).astype(np.uint8)] * 3, axis=-1)
    ys, xs = np.nonzero(seeds)
    H, W = seeds.shape
    for y, x in zip(ys, xs):
        y0, y1 = max(0, y - radius), min(H, y + radius + 1)
        x0, x1 = max(0, x - radius), min(W, x + radius + 1)
        img[y0:y1, x0:x1] = (255, 0, 0)
    return img
