"""Miscellaneous parity utilities.

* duf_downsample — Gaussian 13-tap blur + stride (reference util/util.py:170-201)
* set_random_seed  — seed numpy/python (JAX keys are explicit everywhere)
* ProgressBar      — terminal progress with ETA (util/util.py:307-354 role)
* AdaptiveLR       — validation-plateau LR decay helper (inference_code/model/monitor.py)
"""

from __future__ import annotations

import random
import sys
import time

import numpy as np


def gaussian_kernel_1d(size: int = 13, sigma: float = 1.6) -> np.ndarray:
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def duf_downsample(x, scale: int = 4):
    """NHWC Gaussian-blur + stride downsample used by DUF-style pipelines.

    Matches the reference's kernel choice (13 taps, sigma 0.4*scale)."""
    import jax.numpy as jnp
    from jax import lax

    k1 = jnp.asarray(gaussian_kernel_1d(13, 0.4 * scale))
    pad = 6 + scale // 2
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    # separable depthwise blur
    kh = jnp.tile(k1.reshape(13, 1, 1, 1), (1, 1, 1, C))
    kw = jnp.tile(k1.reshape(1, 13, 1, 1), (1, 1, 1, C))
    y = lax.conv_general_dilated(xp, kh, (1, 1), "VALID",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                 feature_group_count=C)
    y = lax.conv_general_dilated(y, kw, (1, 1), "VALID",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                 feature_group_count=C)
    off = scale // 2
    return y[:, off::scale, off::scale, :][:, : H // scale, : W // scale]


def set_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)


class ProgressBar:
    """Minimal terminal progress bar with rate/ETA."""

    def __init__(self, total: int, width: int = 40):
        self.total = total
        self.width = width
        self.count = 0
        self.start = time.time()

    def update(self, msg: str = ""):
        self.count += 1
        frac = self.count / max(1, self.total)
        elapsed = time.time() - self.start
        eta = elapsed / frac - elapsed if frac > 0 else 0
        filled = int(self.width * frac)
        bar = "#" * filled + "-" * (self.width - filled)
        sys.stdout.write(f"\r[{bar}] {self.count}/{self.total} "
                         f"{1/max(elapsed/max(self.count,1),1e-9):.1f}it/s "
                         f"eta {eta:.0f}s {msg}")
        if self.count >= self.total:
            sys.stdout.write("\n")
        sys.stdout.flush()


class AdaptiveLR:
    """Decay LR when the validation metric plateaus (monitor.py:2-43 role):
    returns the multiplier to apply to the base schedule."""

    def __init__(self, patience: int = 5, factor: float = 0.5,
                 min_scale: float = 1e-3, mode: str = "max"):
        self.patience = patience
        self.factor = factor
        self.min_scale = min_scale
        self.mode = mode
        self.best = None
        self.bad = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        better = self.best is None or (
            metric > self.best if self.mode == "max" else metric < self.best)
        if better:
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad >= self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad = 0
        return self.scale
