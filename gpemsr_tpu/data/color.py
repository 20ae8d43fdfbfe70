"""Color-space conversions and crop helpers (reference data/util.py:217-305):
BT.601 YCbCr <-> RGB/BGR in the [0,1]-float / [0,255]-uint8 convention the
reference uses, plus modcrop."""

from __future__ import annotations

import numpy as np


def _apply(img, mat, offset):
    in_uint8 = img.dtype == np.uint8
    x = img.astype(np.float64)
    if in_uint8:
        x = x / 255.0
    out = x @ mat.T * 255.0 + offset
    if in_uint8:
        return np.clip(out.round(), 0, 255).astype(np.uint8)
    return (out / 255.0).astype(np.float32)


_RGB2YCBCR = np.array([[65.481, 128.553, 24.966],
                       [-37.797, -74.203, 112.0],
                       [112.0, -93.786, -18.214]]) / 255.0
_OFF = np.array([16.0, 128.0, 128.0])


def rgb2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    if only_y:
        m = _RGB2YCBCR[0]
        in_uint8 = img.dtype == np.uint8
        x = img.astype(np.float64) / (255.0 if in_uint8 else 1.0)
        y = x @ m * 255.0 + 16.0
        if in_uint8:
            return np.clip(y.round(), 0, 255).astype(np.uint8)
        return (y / 255.0).astype(np.float32)
    return _apply(img, _RGB2YCBCR, _OFF)


def bgr2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    return rgb2ycbcr(img[..., ::-1], only_y)


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    inv = np.linalg.inv(_RGB2YCBCR)
    in_uint8 = img.dtype == np.uint8
    x = img.astype(np.float64) * (1.0 if in_uint8 else 255.0)
    out = (x - _OFF) @ inv.T
    if in_uint8:
        return np.clip(out.round(), 0, 255).astype(np.uint8)
    return (out / 255.0).astype(np.float32)


def modcrop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H/W down to multiples of `scale` (data/util.py:299-305)."""
    if img.ndim == 2:
        h, w = img.shape
        return img[: h - h % scale, : w - w % scale]
    h, w = img.shape[:2]
    return img[: h - h % scale, : w - w % scale]
