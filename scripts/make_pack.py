"""Pack a PNG dataset tree into a single .pack file (the lmdb role of the
reference's data layer — data/util.py:35-72 — without the native dep).

    python scripts/make_pack.py dataset/synth/HR dataset/synth/HR.pack

Datasets accept the .pack path anywhere a dataroot directory is accepted
(dataroot_GT / dataroot_LQ)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpemsr_tpu.data.pack import write_pack


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="dataset tree root")
    p.add_argument("dst", help="output .pack path")
    p.add_argument("--ext", nargs="*", default=[".png"])
    args = p.parse_args()
    n = write_pack(args.src, args.dst, exts=tuple(args.ext))
    size = os.path.getsize(args.dst)
    print(f"packed {n} files -> {args.dst} ({size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
