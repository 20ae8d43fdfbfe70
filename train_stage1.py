"""Stage-1 CLI: VQGAN prior pretraining.

Usage: python train_stage1.py -opt configs/stage1.yml
(reference train_stage1.py; NCCL/DDP setup replaced by the SPMD mesh)."""

import argparse

from gpemsr_tpu.core.platform import init_platform

init_platform()

from gpemsr_tpu.core.config import ExperimentConfig, load_yaml
from gpemsr_tpu.train.runner import run_stage1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-opt", type=str, required=True, help="Path to YAML config")
    p.add_argument("--host-id", type=int, default=0)
    p.add_argument("--host-count", type=int, default=1)
    args = p.parse_args()
    cfg = load_yaml(args.opt, ExperimentConfig)
    run_stage1(cfg, args.host_id, args.host_count)


if __name__ == "__main__":
    main()
