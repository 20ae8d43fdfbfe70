"""Label-guided watershed seed generation.

Capability parity with the reference's seed utilities
(inference_code/utils/seeds_func.py:44-113 — `gen_seeds`, `gen_seeds_2`,
`erosion_labels`; selectable nowhere from shipped configs, provided for
completeness). mahotas.distance is replaced by the native C++ EDT
(cpp/emseg.cc::edt2d_sq); the reference's distance is squared-euclidean
too, and only the argmax location is consumed.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

from gpemsr_tpu.seg import native


def _prep(labels: np.ndarray, affs_xy: np.ndarray, min_size: int):
    """Drop tiny labels; build the binarized boundary map with a forced
    1-px boundary frame (seeds_func.py:46-57)."""
    labels = labels.copy()
    ids, count = np.unique(labels, return_counts=True)
    for i, c in zip(ids, count):
        if c < min_size:
            labels[labels == i] = 0
    boundary = np.ones_like(affs_xy, dtype=np.float32)
    boundary[1:-1, 1:-1] = affs_xy[1:-1, 1:-1]
    boundary[boundary != 0] = 1
    return labels, boundary


def _seed_positions(labels, distance):
    for label in np.unique(labels):
        if label == 0:
            continue
        d = np.where(labels == label, distance, 0.0)
        flat = int(np.argmax(d))
        yield label, np.unravel_index(flat, d.shape)


def gen_seeds(labels: np.ndarray, affs_xy: np.ndarray, min_size: int = 10):
    """Per-label interior-maximum seeds, renumbered 1..K (seeds_func.py:44).

    Returns (seeds [H,W] int, boundary [H,W] float)."""
    labels, boundary = _prep(labels, affs_xy, min_size)
    distance = native.edt2d_sq((boundary < 0.5).astype(np.uint8))
    seeds = np.zeros_like(labels)
    for ite, (label, (y, x)) in enumerate(_seed_positions(labels, distance),
                                          start=1):
        seeds[y, x] = ite
    return seeds, boundary


def gen_seeds_2(labels: np.ndarray, affs_xy: np.ndarray, min_size: int = 10):
    """Like gen_seeds but seeds keep their ORIGINAL label ids
    (seeds_func.py:70)."""
    labels, boundary = _prep(labels, affs_xy, min_size)
    distance = native.edt2d_sq((boundary < 0.5).astype(np.uint8))
    seeds = np.zeros_like(labels)
    for label, (y, x) in _seed_positions(labels, distance):
        seeds[y, x] = label
    return seeds


def erosion_labels(gt: np.ndarray, steps: int = 1) -> np.ndarray:
    """Erode every nonzero label by `steps` (border_value=1 so image-edge
    blobs don't shrink at the frame, seeds_func.py:97-113). In-place on a
    copy; background stays 0."""
    gt = gt.copy()
    foreground = np.zeros(gt.shape, bool)
    for label in np.unique(gt):
        if label == 0:
            continue
        eroded = ndimage.binary_erosion(gt == label, iterations=steps,
                                        border_value=1)
        foreground |= eroded
    gt[~foreground] = 0
    return gt
