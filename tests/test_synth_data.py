"""Synthetic-EM generator determinism + dataset fingerprinting (VERDICT r4 #3).

The reference protocol's stability rests on fixed eval volumes
(provider_valid.py:77-90). Our synthetic analog must be (a) byte-reproducible
for a given seed + generator version, and (b) content-fingerprinted so any
drift is detected instead of silently re-scoring a stale seg net."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GEN = os.path.join(ROOT, "scripts", "make_synthetic_em.py")
TINY = ["--train-vols", "1", "--train-z", "4", "--train-hw", "48",
        "--test-z", "4", "--test-hw", "48", "--val-z", "2", "--seed", "7"]


def _gen(out):
    subprocess.run([sys.executable, GEN, "--out", out] + TINY,
                   check=True, capture_output=True)


def _read_fp(out):
    with open(os.path.join(out, "FINGERPRINT")) as f:
        return f.read().split()[0]


def test_generation_is_deterministic(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _gen(a)
    _gen(b)
    fa, fb = _read_fp(a), _read_fp(b)
    assert fa == fb, "two same-seed generations differ"
    # and the recorded fingerprint matches a fresh recompute of the tree
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import fingerprint_dataset
    assert fingerprint_dataset.compute(a) == fa


def test_fingerprint_detects_content_change(tmp_path):
    out = str(tmp_path / "d")
    _gen(out)
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import fingerprint_dataset
    before = fingerprint_dataset.compute(out)
    # flip one byte of one PNG
    target = os.path.join(out, "test", "HR", "0.png")
    with open(target, "r+b") as f:
        f.seek(-1, os.SEEK_END)
        last = f.read(1)
        f.seek(-1, os.SEEK_END)
        f.write(bytes([last[0] ^ 1]))
    assert fingerprint_dataset.compute(out) != before


def test_fingerprint_ignores_derived_sr_exports(tmp_path):
    out = str(tmp_path / "d")
    _gen(out)
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import fingerprint_dataset
    before = fingerprint_dataset.compute(out)
    # SR exports are derived artifacts written INTO the tree by run_baseline
    sr = os.path.join(out, "test", "SR_v9", "x16")
    os.makedirs(sr)
    with open(os.path.join(sr, "0.png"), "wb") as f:
        f.write(b"derived")
    assert fingerprint_dataset.compute(out) == before
