"""Image conversion / IO helpers (reference: util/util.py:139-166, data/util.py:75-88)."""

from __future__ import annotations

import numpy as np
from PIL import Image


def tensor2img(t, min_max=(0.0, 1.0)) -> np.ndarray:
    """[B,H,W,C] / [H,W,C] / [H,W] array (any framework) -> uint8 HxW(xC).

    Matches util/util.py:139-163: clamp to min_max, rescale to [0,1],
    round to uint8."""
    a = np.asarray(t, dtype=np.float32)
    a = np.clip(a, *min_max)
    a = (a - min_max[0]) / (min_max[1] - min_max[0])
    a = np.squeeze(a)
    return (a * 255.0).round().astype(np.uint8)


def save_img(img: np.ndarray, path: str) -> None:
    Image.fromarray(img).save(path)


def to_float_img(img: np.ndarray) -> np.ndarray:
    """uint8 array -> float32 HWC in [0,1], grayscale kept as 1 channel
    (data/util.py:75-88 semantics)."""
    img = img.astype(np.float32) / 255.0
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[2] > 3:
        img = img[..., :3]
    return img


def read_img(path: str) -> np.ndarray:
    """PNG -> float32 HWC in [0,1] (data/util.py:75-88 semantics)."""
    return to_float_img(np.asarray(Image.open(path)))
