"""Alternative training-target generation for segmentation nets.

Capability parity with reference inference_code/data/data_transform.py:13-133
(distance-transform targets) and data_segmentation.py:100-120
(seg_to_instance_bd): Euclidean/binary distance maps and instance boundary
masks derivable from a label volume."""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def seg_to_instance_bd(seg: np.ndarray, tsz_h: int = 1,
                       do_bg: bool = True) -> np.ndarray:
    """Per-slice instance boundary mask: voxels whose (2h+1)^2 window sees
    more than one label (optionally counting background)."""
    out = np.zeros(seg.shape, np.uint8)
    t = 2 * tsz_h + 1
    for z in range(seg.shape[0]):
        sl = seg[z]
        p = np.pad(sl, tsz_h, mode="edge")
        win = np.lib.stride_tricks.sliding_window_view(p, (t, t))
        wmax = win.max(axis=(2, 3))
        if do_bg:
            wmin = win.min(axis=(2, 3))
        else:
            w = win.reshape(win.shape[0], win.shape[1], -1).astype(np.int64)
            mm = sl.max()
            w = np.where(w == 0, mm + 1, w)
            wmin = w.min(axis=2)
        out[z] = (wmax != wmin).astype(np.uint8)
    return out


def distance_transform_target(seg: np.ndarray, mode: str = "euclidean",
                              resolution=(1.0, 1.0), alpha: float = 8.0
                              ) -> np.ndarray:
    """Per-slice intra-instance distance to the boundary, normalised to
    (0, 1] inside objects, 0 outside (the 'dt' regression target family)."""
    out = np.zeros(seg.shape, np.float32)
    for z in range(seg.shape[0]):
        sl = seg[z]
        for lab in np.unique(sl):
            if lab == 0:
                continue
            m = sl == lab
            if mode == "euclidean":
                d = ndimage.distance_transform_edt(m, sampling=resolution)
            else:
                d = ndimage.distance_transform_cdt(m)
            mx = d.max()
            if mx > 0:
                out[z][m] = (d[m] / mx if alpha is None
                             else np.tanh(d[m] / alpha))
    return out


def skeleton_aware_weight(dist_target: np.ndarray, w0: float = 1.0,
                          gamma: float = 2.0) -> np.ndarray:
    """Loss weight emphasising thin structures: w = w0 + (1 - dt)^gamma on
    foreground."""
    fg = dist_target > 0
    w = np.ones_like(dist_target, np.float32)
    w[fg] = w0 + (1.0 - dist_target[fg]) ** gamma
    return w
