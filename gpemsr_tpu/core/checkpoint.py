"""Atomic checkpointing with resume-from-latest.

Upgrades the reference's manual torch.save/.pth flow (train_stage1.py:264-283;
optimizer state was read on resume but never written — SURVEY §5.4): we always
persist params + optimizer state + step, write atomically (tmp + rename), keep
the last K, and `latest_step` enables unattended restart recovery."""

from __future__ import annotations

import os
import pickle
import re
import shutil
import tempfile
from typing import Any

import jax
import numpy as np

_STEP_RE = re.compile(r"^step_(\d+)$")


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save(ckpt_dir: str, step: int, payload: Any, keep: int = 10) -> str:
    """Atomically write `payload` (any pytree of arrays/scalars/pickleables)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    final = os.path.join(ckpt_dir, f"step_{step}")
    tmp = tempfile.mkdtemp(dir=ckpt_dir, prefix=".tmp_")
    with open(os.path.join(tmp, "payload.pkl"), "wb") as f:
        pickle.dump(_to_host(payload), f, protocol=4)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    _gc(ckpt_dir, keep)
    return final


def _gc(ckpt_dir: str, keep: int):
    steps = all_steps(ckpt_dir)
    for s in steps[:-keep] if keep > 0 else []:
        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"), ignore_errors=True)


def all_steps(ckpt_dir: str) -> list[int]:
    if not os.path.isdir(ckpt_dir):
        return []
    steps = []
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name)
        if m and os.path.exists(os.path.join(ckpt_dir, name, "payload.pkl")):
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_step(ckpt_dir: str) -> int | None:
    steps = all_steps(ckpt_dir)
    return steps[-1] if steps else None


def restore(ckpt_dir: str, step: int | None = None) -> Any:
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    with open(os.path.join(ckpt_dir, f"step_{step}", "payload.pkl"), "rb") as f:
        return pickle.load(f)
