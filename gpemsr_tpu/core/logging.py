"""Logging + scalar metrics (reference util/util.py:104-118 + TensorBoard wiring).

File+stream logger and a JSONL metrics writer (tensorboard-free; the JSONL is
trivially importable into TB/W&B). Also mkdir_and_rename experiment archival."""

from __future__ import annotations

import json
import logging
import os
import time


def setup_logger(name: str = "gpemsr", log_dir: str | None = None,
                 screen: bool = True, level=logging.INFO) -> logging.Logger:
    lg = logging.getLogger(name)
    lg.setLevel(level)
    lg.handlers.clear()
    fmt = logging.Formatter("%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s",
                            datefmt="%y-%m-%d %H:%M:%S")
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, f"{name}_{int(time.time())}.log"))
        fh.setFormatter(fmt)
        lg.addHandler(fh)
    if screen:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        lg.addHandler(sh)
    return lg


class MetricsWriter:
    """Append-only JSONL scalar log: one {'step': n, 'tag': v, ...} per line."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def write(self, step: int, **scalars):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()


def mkdir_and_rename(path: str):
    """Archive an existing experiment dir with a timestamp suffix
    (util/util.py:87-94 behavior), then create fresh."""
    if os.path.exists(path):
        archived = path + "_archived_" + time.strftime("%y%m%d-%H%M%S")
        os.rename(path, archived)
    os.makedirs(path, exist_ok=True)
