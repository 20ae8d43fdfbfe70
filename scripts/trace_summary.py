"""Summarize a jax.profiler perfetto trace: device-lane op time by category.

Input: the directory passed to scripts/profile_trace.py (finds the newest
`*.trace.json.gz` under it). Prints total device time, a category table
(fusion / copy-transpose / conv / dot / pallas custom-call / dynamic-slice /
other), and the top-N single ops — so optimization targets are ranked by
measured time, not intuition (VERDICT r2 #9).

Categories follow XLA op-name conventions on TPU device lanes: `fusion.N`
(loop/input/output fusions), `copy[-start/-done].N` + `transpose.N` +
`bitcast-convert` (pure layout traffic), `convolution.N`, `dot.N` /
`cublas`-style custom matmul names, `custom-call.N` (Pallas kernels land
here), `dynamic-update-slice` / `dynamic-slice`, `all-reduce`/collectives.

Usage: python scripts/trace_summary.py DIR [--top N] [--lane SUBSTR]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(root):
    cands = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not cands:
        sys.exit(f"no *.trace.json.gz under {root}")
    return cands[-1]


_CATS = [
    ("copy/transpose", re.compile(r"^(copy|transpose|bitcast|reshape)")),
    ("fusion", re.compile(r"^(fusion|loop_fusion|input_fusion)")),
    ("conv", re.compile(r"^convolution")),
    ("dot", re.compile(r"^dot")),
    ("pallas/custom-call", re.compile(r"^custom-call")),
    ("dynamic-slice", re.compile(r"^dynamic[-_](update[-_])?slice")),
    ("collective", re.compile(r"^(all-|reduce-scatter|collective)")),
    ("scan/while", re.compile(r"^(while|conditional)")),
]


def categorize(name):
    base = name.split("/")[-1] if "/" in name else name
    for cat, pat in _CATS:
        if pat.match(base) or pat.match(name):
            return cat
    return "other"


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    top = 25
    lane_filter = "TPU"
    for i, a in enumerate(sys.argv):
        if a == "--top":
            top = int(sys.argv[i + 1])
        if a == "--lane":
            lane_filter = sys.argv[i + 1]

    path = find_trace(root)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # map (pid, tid) -> lane name from metadata events
    names = {}
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e["args"]["name"]

    def lane_of(e):
        ln = names.get((e.get("pid"), e.get("tid")), "")
        pn = pid_names.get(e.get("pid"), "")
        return f"{pn}:{ln}"

    by_cat = collections.Counter()
    by_op = collections.Counter()
    lanes = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        lane = lane_of(e)
        if lane_filter not in lane:
            continue
        # keep compute/step lanes; skip host-side and derived stat lanes
        low = lane.lower()
        if any(s in low for s in ("steps", "framework", "host", "xla modules",
                                  "source", "scopes")):
            continue
        dur = float(e["dur"])  # microseconds
        name = e.get("name", "?")
        total += dur
        lanes[lane] += dur
        by_cat[categorize(name)] += dur
        by_op[name] += dur

    print(f"trace: {path}")
    for lane, d in lanes.most_common():
        print(f"lane {lane}: {d / 1e3:.2f} ms")
    print(f"\ntotal device op time: {total / 1e3:.2f} ms")
    print(f"\n{'category':<22}{'ms':>10}{'%':>7}")
    for cat, d in by_cat.most_common():
        print(f"{cat:<22}{d / 1e3:>10.2f}{100 * d / max(total, 1e-9):>6.1f}%")
    print(f"\ntop {top} ops:")
    for name, d in by_op.most_common(top):
        print(f"  {d / 1e3:>8.2f} ms {100 * d / max(total, 1e-9):>5.1f}%  "
              f"{categorize(name):<18} {name[:90]}")


if __name__ == "__main__":
    main()
