"""Export metrics.jsonl to TensorBoard event files.

The reference logs scalars to ../tb_logger/<name> via SummaryWriter
(train_stage1.py:66-75,234; train_stage3.py:372-374). Our trainers write
metrics.jsonl (importable, diffable); this exporter produces the same
TensorBoard view from it for users who want the TB UI:

    python scripts/metrics_to_tb.py runs/<exp> [--logdir tb_logger/<exp>]

Every numeric key in every record becomes a scalar series keyed by `step`.
Gated on torch's bundled TensorBoard; exits with a message if absent.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def export(metrics_path: str, logdir: str) -> int:
    try:
        from torch.utils.tensorboard import SummaryWriter
    except ImportError:
        print("tensorboard not available (pip install tensorboard)",
              file=sys.stderr)
        return 2
    writer = SummaryWriter(logdir)
    n = 0
    with open(metrics_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            step = int(rec.get("step", n))
            for k, v in rec.items():
                if k in ("step", "time"):
                    continue
                if isinstance(v, (int, float)):
                    writer.add_scalar(k, v, step)
                    n += 1
    writer.close()
    print(f"wrote {n} scalars -> {logdir}")
    return 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("exp", help="experiment dir (containing metrics.jsonl) "
                               "or a metrics.jsonl path")
    p.add_argument("--logdir", default=None,
                   help="TB logdir (default: tb_logger/<exp-name>)")
    args = p.parse_args()
    path = args.exp
    if os.path.isdir(path):
        name = os.path.basename(os.path.normpath(path))
        path = os.path.join(path, "metrics.jsonl")
    else:
        name = os.path.basename(os.path.dirname(path)) or "experiment"
    logdir = args.logdir or os.path.join("tb_logger", name)
    sys.exit(export(path, logdir))


if __name__ == "__main__":
    main()
