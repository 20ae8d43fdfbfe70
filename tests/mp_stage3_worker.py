"""Subprocess worker for the true multi-process jax.distributed test.

Each process runs the SAME program (SPMD): init_platform() wires
jax.distributed from JAX_COORDINATOR + GPEMSR_HOST_ID/COUNT on a CPU
backend (GPEMSR_FORCE_CPU local devices per process), then drives the
production run_stage3 for two steps — the reference's one-process-per-GPU
NCCL DDP role (train_stage1.py:18-25, DDP wrap :131-134) executed with
real process boundaries instead of a single-process virtual mesh.

Usage: python tests/mp_stage3_worker.py <data_dir> <out_root>
Env:   GPEMSR_FORCE_CPU, [JAX_COORDINATOR, GPEMSR_HOST_ID, GPEMSR_HOST_COUNT]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    from gpemsr_tpu.core.platform import init_platform
    init_platform()

    import jax

    from __graft_entry__ import _flagship_cfg
    from gpemsr_tpu.core.config import (
        DatasetConfig, ExperimentConfig, ParallelConfig, TrainConfig,
    )
    from gpemsr_tpu.train.runner import run_stage3

    data_dir, out_root = sys.argv[1], sys.argv[2]
    host_id = int(os.environ.get("GPEMSR_HOST_ID", 0))
    host_count = int(os.environ.get("GPEMSR_HOST_COUNT", 1))

    ds = DatasetConfig(dataroot_GT=os.path.join(data_dir, "HR"),
                       dataroot_LQ=os.path.join(data_dir, "LR"),
                       N_frames=5, GT_size=128, LQ_size=8,
                       batch_size=4, n_workers=1)
    cfg = ExperimentConfig(
        name="mp3", stage=3, scale=16, root=out_root,
        save_checkpoint_freq=10 ** 9, datasets={"train": ds},
        network=_flagship_cfg(tiny=True),
        train=TrainConfig(niter=2, T_period=[10], restarts=[],
                          restart_weights=[], val_freq=10 ** 9,
                          logger_freq=1, ref_loss_factor=0.01),
        parallel=ParallelConfig(data=4))
    run_stage3(cfg, host_id, host_count)
    print(f"WORKER_DONE process={jax.process_index()}/{jax.process_count()} "
          f"devices={len(jax.devices())}", flush=True)


if __name__ == "__main__":
    main()
