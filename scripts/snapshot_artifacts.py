"""Persist baseline training state across build rounds.

`runs/` and `dataset/` are gitignored scratch space and have been observed
to be wiped between rounds (the round-3 v3 training was lost this way:
stage 1 complete + stage 2 at 11k steps, all gone). This script copies the
LATEST checkpoint of each baseline stage — plus RESULTS.json and the
protocol seg net — into the git-tracked `artifacts/` tree so the next round
resumes training instead of restarting from scratch.

  python scripts/snapshot_artifacts.py --save            # runs/ -> artifacts/
  python scripts/snapshot_artifacts.py --restore         # artifacts/ -> runs/

Restore never clobbers a newer local checkpoint: if runs/ already holds a
step >= the snapshot, the snapshot is skipped for that stage. Save likewise
never replaces a snapshot with a lower-step checkpoint unless --force.

Repo-growth note (ADVICE r4): each snapshot round replaces ~1.5 GB of pickle
checkpoints in the working tree; the old blobs stay in git history, so the
repo grows by that much per snapshot. git-lfs is unavailable in this
environment — snapshot sparingly (end of round, after a training milestone),
and prune history if the repo ever needs slimming.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from gpemsr_tpu.core import checkpoint as ckpt  # noqa: E402

SUFFIX = os.environ.get("GPEMSR_BASELINE_SUFFIX", "_v3")
ART = os.path.join(ROOT, "artifacts", "baseline" + SUFFIX)

# (run subtree, artifact subtree) pairs; seg net lives under the suffixless
# run on purpose — it is trained on HR only and shared between baselines.
STAGES = [
    (os.path.join("runs", "baseline" + SUFFIX, s), s)
    for s in ("baseline_stage1", "baseline_stage2", "baseline_stage3",
              "baseline_stage2_x8", "baseline_stage3_x8")
] + [(os.path.join("runs", "baseline", "seg_superhuman"), "seg_superhuman"),
     (os.path.join("runs", "baseline", "seg_mala"), "seg_mala")]


def _copy_step(src_ckpts: str, dst_ckpts: str, step: int, prune: bool = False):
    src = os.path.join(src_ckpts, f"step_{step}")
    dst = os.path.join(dst_ckpts, f"step_{step}")
    tmp = dst + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    shutil.copytree(src, tmp)
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.rename(tmp, dst)
    if not prune:
        # restore direction: never delete the destination's other local
        # checkpoints (they are untracked and unrecoverable)
        return
    # keep only the newest snapshot per stage — artifacts live in git history
    for s in ckpt.all_steps(dst_ckpts):
        if s != step:
            shutil.rmtree(os.path.join(dst_ckpts, f"step_{s}"),
                          ignore_errors=True)


def save(force: bool = False):
    copied = []
    for run_rel, name in STAGES:
        src = os.path.join(ROOT, run_rel, "checkpoints")
        step = ckpt.latest_step(src)
        if step is None:
            continue
        dst = os.path.join(ART, name, "checkpoints")
        os.makedirs(dst, exist_ok=True)
        have = ckpt.latest_step(dst)
        if have == step:
            continue
        if have is not None and have > step and not force:
            # no-clobber: runs/ was wiped and training restarted from scratch;
            # replacing the higher-step snapshot with a lower one (then gc'ing
            # it) would silently lose the better state. --force overrides.
            print(f"{name}: snapshot @{have} > local @{step}, keeping "
                  f"snapshot (use --force to overwrite)")
            continue
        _copy_step(src, dst, step, prune=True)
        copied.append(f"{name}@{step}")
    results = os.path.join(ROOT, "runs", "baseline" + SUFFIX, "RESULTS.json")
    if os.path.exists(results):
        os.makedirs(ART, exist_ok=True)
        shutil.copy2(results, os.path.join(ART, "RESULTS.json"))
        copied.append("RESULTS.json")
    print("snapshot:", ", ".join(copied) if copied else "nothing new")


def restore():
    restored = []
    for run_rel, name in STAGES:
        src = os.path.join(ART, name, "checkpoints")
        step = ckpt.latest_step(src)
        if step is None:
            continue
        dst = os.path.join(ROOT, run_rel, "checkpoints")
        local = ckpt.latest_step(dst)
        if local is not None and local >= step:
            print(f"{name}: local @{local} >= snapshot @{step}, keeping local")
            continue
        os.makedirs(dst, exist_ok=True)
        _copy_step(src, dst, step)
        restored.append(f"{name}@{step}")
    results = os.path.join(ART, "RESULTS.json")
    run_results = os.path.join(ROOT, "runs", "baseline" + SUFFIX,
                               "RESULTS.json")
    if os.path.exists(results) and not os.path.exists(run_results):
        os.makedirs(os.path.dirname(run_results), exist_ok=True)
        shutil.copy2(results, run_results)
        restored.append("RESULTS.json")
    print("restored:", ", ".join(restored) if restored else "nothing")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--save", action="store_true")
    g.add_argument("--restore", action="store_true")
    p.add_argument("--force", action="store_true",
                   help="save: overwrite a snapshot even when it holds a "
                        "higher step than the local run")
    a = p.parse_args()
    save(force=a.force) if a.save else restore()
