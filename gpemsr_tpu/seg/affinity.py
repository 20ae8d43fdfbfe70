"""Affinity-graph generation and label preprocessing.

Capability parity with reference inference_code/data/data_affinity.py:53-102
(seg_to_aff with replicate boundary pad), data_segmentation.py:57-79
(seg_widen_border) and :205-228 (weight_binary_ratio), vectorised numpy."""

from __future__ import annotations

import numpy as np


def mknhood3d(radius: int = 1) -> np.ndarray:
    """Standard 3-D 6-neighbourhood offsets for radius 1:
    [[-1,0,0],[0,-1,0],[0,0,-1]] (z, y, x)."""
    assert radius == 1, "only radius-1 nhood used by the shipped configs"
    return np.array([[-1, 0, 0], [0, -1, 0], [0, 0, -1]], np.int32)


def seg_to_aff(seg: np.ndarray, nhood: np.ndarray | None = None,
               pad: str = "replicate") -> np.ndarray:
    """Segmentation [Z,Y,X] -> affinity graph [E,Z,Y,X] (float32).

    aff[e, p] = 1 iff seg[p] == seg[p + nhood[e]] and both labels > 0.
    With pad='replicate' the out-of-range boundary plane is filled with the
    foreground mask (data_affinity.py:98-102)."""
    if nhood is None:
        nhood = mknhood3d(1)
    shape = seg.shape
    aff = np.zeros((nhood.shape[0],) + shape, np.float32)
    for e, off in enumerate(nhood):
        src = tuple(slice(max(0, -o), min(s, s - o))
                    for o, s in zip(off, shape))
        dst = tuple(slice(max(0, o), min(s, s + o))
                    for o, s in zip(off, shape))
        a = seg[src]
        b = seg[dst]
        aff[(e,) + src] = ((a == b) & (a > 0) & (b > 0)).astype(np.float32)
    if pad == "replicate" and nhood.shape[0] == 3:
        aff[0, 0] = (seg[0] > 0).astype(np.float32)
        aff[1, :, 0] = (seg[:, 0] > 0).astype(np.float32)
        aff[2, :, :, 0] = (seg[:, :, 0] > 0).astype(np.float32)
    return aff


def seg_widen_border(seg: np.ndarray, tsz_h: int = 1) -> np.ndarray:
    """Kisuk Lee border widening: zero any voxel whose (2h+1)^2 in-plane
    window contains more than one positive segment id
    (data_segmentation.py:57-79). Vectorised via sliding-window min/max."""
    seg = seg.copy()
    vol = seg if seg.ndim == 3 else seg[None]
    t = 2 * tsz_h + 1
    for z in range(vol.shape[0]):
        sl = vol[z]
        mm = sl.max()
        p = np.pad(sl, tsz_h, mode="reflect")
        win = np.lib.stride_tricks.sliding_window_view(p, (t, t))
        wmax = win.max(axis=(2, 3))
        w0 = win.reshape(win.shape[0], win.shape[1], -1).astype(np.int64)
        w0 = np.where(w0 == 0, mm + 1, w0)
        wmin = w0.min(axis=2)
        vol[z] = sl * (wmax == wmin)
    return seg if seg.ndim == 3 else vol[0]


def gen_seg_malis(seg: np.ndarray, iters: int = 1) -> np.ndarray:
    """Alternative border gen (seg_util.py:159-176): zero voxels whose label
    differs from a neighbour, then erode by simple dilation of the border."""
    from scipy import ndimage
    out = seg.copy()
    for z in range(out.shape[0]):
        sl = out[z]
        border = np.zeros_like(sl, bool)
        border[:-1] |= sl[:-1] != sl[1:]
        border[1:] |= sl[1:] != sl[:-1]
        border[:, :-1] |= sl[:, :-1] != sl[:, 1:]
        border[:, 1:] |= sl[:, 1:] != sl[:, :-1]
        border = ndimage.binary_dilation(border, iterations=iters)
        out[z] = np.where(border, 0, sl)
    return out


def weight_binary_ratio(label: np.ndarray, alpha: float = 1.0) -> np.ndarray:
    """Binary class-rebalancing weight map (data_segmentation.py:205-228)."""
    if label.max() == label.min():
        return np.ones_like(label, np.float32)
    lab = (label != 0).astype(np.float64)
    frac = np.clip(lab.sum() / lab.size, 5e-2, 0.99)
    if frac > 0.5:
        weight = lab + alpha * frac / (1 - frac) * (1 - lab)
    else:
        weight = alpha * (1 - frac) / frac * lab + (1 - lab)
    return weight.astype(np.float32)
