"""Content-fingerprint for the synthetic dataset tree (VERDICT r4 #3).

Round 4 regenerated `dataset/synth` under the protocol (the generator code
had evolved between rounds, so seed 0 produced a different draw) and the
existence-keyed skip logic in run_baseline silently scored a seg net trained
on the previous draw. The fix is content-keying: every generation writes
`FINGERPRINT` (sha256 over all file bytes + relative paths), and every
consumer (seg-net reuse, SR export reuse) verifies it.

  python scripts/fingerprint_dataset.py dataset/synth            # print
  python scripts/fingerprint_dataset.py dataset/synth --write    # + FINGERPRINT
"""

from __future__ import annotations

import hashlib
import os
import sys

FNAME = "FINGERPRINT"


def compute(root: str) -> str:
    """sha256 over every file under `root` (sorted relpath + bytes),
    excluding FINGERPRINT itself and any derived SR exports (test/SR*)."""
    h = hashlib.sha256()
    entries = []
    for dirpath, dirnames, filenames in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        # SR exports are derived artifacts written INTO the dataset tree by
        # run_baseline (test/SR_v3/...); they must not churn the identity of
        # the generated data they were derived from.
        dirnames[:] = sorted(d for d in dirnames
                             if not (rel in (".", "test") and d.startswith("SR")))
        for f in sorted(filenames):
            if f == FNAME:
                continue
            entries.append(os.path.join(rel, f).replace(os.sep, "/"))
    for relf in sorted(entries):
        h.update(relf.encode())
        with open(os.path.join(root, relf), "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
    return h.hexdigest()


def read(root: str) -> str | None:
    p = os.path.join(root, FNAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return f.read().split()[0]


def write(root: str) -> str:
    fp = compute(root)
    with open(os.path.join(root, FNAME), "w") as f:
        f.write(fp + "\n")
    return fp


def ensure(root: str) -> str:
    """Return the recorded fingerprint, computing + writing it when absent
    (adopts a pre-fingerprint dataset as canonical)."""
    fp = read(root)
    if fp is None:
        fp = write(root)
        print(f"fingerprint adopted: {fp[:16]}… -> {root}/{FNAME}")
    return fp


if __name__ == "__main__":
    root = sys.argv[1]
    if "--write" in sys.argv:
        print(write(root))
    else:
        print(compute(root))
