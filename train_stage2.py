"""Stage-2 CLI: LR->codebook Indexer training on a frozen VQGAN.

Usage: python train_stage2.py -opt configs/stage2_x16.yml
       [--stage1-ckpt runs/VQGAN_Stage1/checkpoints]"""

import argparse

from gpemsr_tpu.core.platform import init_platform

init_platform()

from gpemsr_tpu.core import checkpoint as ckpt
from gpemsr_tpu.core.config import ExperimentConfig, load_yaml
from gpemsr_tpu.train.runner import run_stage2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-opt", type=str, required=True)
    p.add_argument("--stage1-ckpt", type=str, default=None,
                   help="checkpoint dir of stage-1 (loads generator params)")
    p.add_argument("--host-id", type=int, default=0)
    p.add_argument("--host-count", type=int, default=1)
    args = p.parse_args()
    cfg = load_yaml(args.opt, ExperimentConfig)
    stage1_params = None
    if args.stage1_ckpt and args.stage1_ckpt.endswith((".pth", ".pt")):
        # reference stage-1 torch checkpoint (strict=False load semantics)
        import torch
        from gpemsr_tpu.models.convert import convert_vqgan_generator
        sd = torch.load(args.stage1_ckpt, map_location="cpu")
        stage1_params = convert_vqgan_generator(sd, cfg.network.prior)
    elif args.stage1_ckpt:
        stage1_params = ckpt.restore(args.stage1_ckpt)["g"]
    run_stage2(cfg, args.host_id, args.host_count, stage1_params=stage1_params)


if __name__ == "__main__":
    main()
