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
