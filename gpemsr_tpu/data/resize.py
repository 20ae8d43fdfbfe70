"""MATLAB-compatible bicubic resize (numpy).

The reference's LR data generation uses a MATLAB-exact `imresize`
(data/util.py:385-521): cubic kernel (a=-0.5), kernel widened by 1/scale with
antialiasing on downscale, weights renormalised, replicate border handling.
Separable implementation as two weighted gathers."""

from __future__ import annotations

import numpy as np


def _cubic(x):
    ax = np.abs(x)
    ax2, ax3 = ax ** 2, ax ** 3
    return ((1.5 * ax3 - 2.5 * ax2 + 1) * (ax <= 1) +
            (-0.5 * ax3 + 2.5 * ax2 - 4 * ax + 2) * ((ax > 1) & (ax <= 2)))


def _contributions(in_len, out_len, scale):
    kernel_width = 4.0
    if scale < 1:
        kernel_width /= scale
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(np.ceil(kernel_width)) + 2
    idx = left[:, None] + np.arange(p)[None, :]       # [out, p]
    dist = u[:, None] - idx
    if scale < 1:
        w = scale * _cubic(dist * scale)
    else:
        w = _cubic(dist)
    w = w / np.sum(w, axis=1, keepdims=True)
    # replicate border: clamp indices
    idx = np.clip(idx - 1, 0, in_len - 1).astype(np.int64)
    # drop all-zero weight columns
    keep = ~np.all(w == 0, axis=0)
    return w[:, keep], idx[:, keep]


def imresize_np(img: np.ndarray, scale: float) -> np.ndarray:
    """HWC float image -> MATLAB-bicubic resized HWC."""
    img = np.asarray(img, np.float64)
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    H, W, C = img.shape
    out_h = int(np.ceil(H * scale))
    out_w = int(np.ceil(W * scale))

    wh, ih = _contributions(H, out_h, scale)
    out = np.einsum("op,opwc->owc", wh, img[ih])          # rows
    ww, iw = _contributions(W, out_w, scale)
    out = np.einsum("op,hopc->hoc", ww, out[:, iw])       # cols

    res = out.astype(np.float32)
    return res[..., 0] if squeeze else res
