"""MATLAB-compatible bicubic resize (numpy).

The reference's LR data generation uses a MATLAB-exact `imresize`
(data/util.py:385-521): cubic kernel (a=-0.5), kernel widened by 1/scale with
antialiasing on downscale, weights renormalised, **symmetric (mirror) border
copying** and the first/last zero-column narrowing of
`calculate_weights_indices` (data/util.py:334-383). Separable implementation
as two weighted gathers with indices pre-folded through the mirror map — no
materialised padded array."""

from __future__ import annotations

import numpy as np


def _cubic(x):
    ax = np.abs(x)
    ax2, ax3 = ax ** 2, ax ** 3
    return ((1.5 * ax3 - 2.5 * ax2 + 1) * (ax <= 1) +
            (-0.5 * ax3 + 2.5 * ax2 - 4 * ax + 2) * ((ax > 1) & (ax <= 2)))


def _reflect(idx: np.ndarray, n: int) -> np.ndarray:
    """Multi-fold symmetric reflection of 0-based indices into [0, n)
    (equivalent to the reference's explicit mirror-copied border slabs)."""
    period = 2 * n
    m = np.mod(idx, period)
    return np.where(m >= n, period - 1 - m, m).astype(np.int64)


def _contributions(in_len, out_len, scale, antialiasing=True):
    """Weights + (mirror-folded) source indices per output position,
    replicating calculate_weights_indices exactly: P = ceil(kw)+2 taps,
    renormalised rows, and the drop-first/last-column narrowing keyed on
    any-zero in the edge columns."""
    kernel_width = 4.0
    if scale < 1 and antialiasing:
        kernel_width /= scale
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(np.ceil(kernel_width)) + 2
    idx = left[:, None] + np.arange(p)[None, :]       # [out, p], 1-based
    dist = u[:, None] - idx
    if scale < 1 and antialiasing:
        w = scale * _cubic(dist * scale)
    else:
        w = _cubic(dist)
    w = w / np.sum(w, axis=1, keepdims=True)
    # narrow exactly as the reference does (data/util.py:375-380): if the
    # first column contains any zero, drop the first AND last columns; else
    # if the last column contains any zero, drop the last two.
    zeros_per_col = np.sum(w == 0, axis=0)
    if zeros_per_col[0] != 0:
        idx, w = idx[:, 1:p - 1], w[:, 1:p - 1]
    elif zeros_per_col[-1] != 0:
        idx, w = idx[:, 0:p - 2], w[:, 0:p - 2]
    # symmetric border: fold out-of-range indices through the mirror map
    idx = _reflect(idx.astype(np.int64) - 1, in_len)
    return w, idx


def imresize_np(img: np.ndarray, scale: float,
                antialiasing: bool = True) -> np.ndarray:
    """HWC float image -> MATLAB-bicubic resized HWC."""
    img = np.asarray(img, np.float64)
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    H, W, C = img.shape
    out_h = int(np.ceil(H * scale))
    out_w = int(np.ceil(W * scale))

    wh, ih = _contributions(H, out_h, scale, antialiasing)
    out = np.einsum("op,opwc->owc", wh, img[ih])          # rows
    ww, iw = _contributions(W, out_w, scale, antialiasing)
    out = np.einsum("op,hopc->hoc", ww, out[:, iw])       # cols

    res = out.astype(np.float32)
    return res[..., 0] if squeeze else res
