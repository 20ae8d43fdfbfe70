"""True multi-process jax.distributed execution (VERDICT round-2 #4).

The reference really runs one-process-per-GPU NCCL DDP
(train_stage1.py:18-25); every other test in this suite exercises the SPMD
mesh inside ONE process with virtual devices. This test spawns two real
processes that form a single 4-device global CPU mesh via
jax.distributed.initialize and drives the production run_stage3 through
them, asserting (a) both processes compute identical (replicated) global
metrics and (b) the 2-process run reproduces the single-process run's
losses — the gradient psum across process boundaries is semantically the
same allreduce DDP performs.

Slow (three tiny-model CPU compiles); kept minimal — 2 steps each.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "mp_stage3_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_dataset(td):
    from PIL import Image
    rng = np.random.default_rng(0)
    for z in range(10):
        for root, size in (("HR", 128), ("LR", 8)):
            p = os.path.join(td, root, "volA")
            os.makedirs(p, exist_ok=True)
            Image.fromarray(rng.integers(0, 255, (size, size))
                            .astype(np.uint8)).save(
                os.path.join(p, f"{z}.png"))


def _read_metrics(out_root):
    path = os.path.join(out_root, "mp3", "metrics.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f]


def _env(**extra):
    env = dict(os.environ)
    env.pop("JAX_COORDINATOR", None)
    env.pop("GPEMSR_HOST_ID", None)
    env.pop("GPEMSR_HOST_COUNT", None)
    env.update({k: str(v) for k, v in extra.items()})
    return env


@pytest.mark.slow
def test_two_process_distributed_matches_single(tmp_path):
    td = str(tmp_path / "data")
    _make_dataset(td)

    # reference: single process, 4 virtual devices
    single_root = str(tmp_path / "runs_single")
    r = subprocess.run(
        [sys.executable, WORKER, td, single_root],
        env=_env(GPEMSR_FORCE_CPU=4), cwd=ROOT,
        capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "process=0/1" in r.stdout and "devices=4" in r.stdout

    # 2 real processes x 2 local CPU devices -> the same global 4-device mesh
    port = _free_port()
    roots = [str(tmp_path / f"runs_mp{i}") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, td, roots[i]],
            env=_env(GPEMSR_FORCE_CPU=2,
                     JAX_COORDINATOR=f"localhost:{port}",
                     GPEMSR_HOST_ID=i, GPEMSR_HOST_COUNT=2),
            cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"host {i} failed:\n{err[-3000:]}"
        assert f"process={i}/2" in out and "devices=4" in out, out

    m_single = _read_metrics(single_root)
    m0 = _read_metrics(roots[0])
    m1 = _read_metrics(roots[1])
    assert len(m_single) == len(m0) == len(m1) == 2

    for a, b in zip(m0, m1):
        for k in a:
            if k in ("step", "time"):
                continue
            # both processes see the same replicated global metric
            np.testing.assert_allclose(a[k], b[k], rtol=0, atol=0,
                                       err_msg=f"hosts disagree on {k}")
    for a, b in zip(m_single, m0):
        for k in a:
            if k in ("step", "time") or not isinstance(a[k], float):
                continue
            # global batch set + per-sample aug seeds are shard-invariant;
            # only the reduction order differs across layouts
            np.testing.assert_allclose(
                a[k], b[k], rtol=2e-4, atol=2e-5,
                err_msg=f"2-process diverges from single-process on {k}")
