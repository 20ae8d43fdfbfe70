"""Stage-3 CLI: full GPEMSR multi-frame SR training.

Usage: python train_stage3.py -opt configs/stage3_x16.yml
       [--prior-ckpt runs/Indexer_x16/checkpoints]"""

import argparse

from gpemsr_tpu.core.platform import init_platform

init_platform()

from gpemsr_tpu.core import checkpoint as ckpt
from gpemsr_tpu.core.config import ExperimentConfig, load_yaml
from gpemsr_tpu.train.runner import run_stage3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-opt", type=str, required=True)
    p.add_argument("--prior-ckpt", type=str, default=None,
                   help="stage-2 checkpoint dir (frozen prior weights)")
    p.add_argument("--ref-g", type=str, default=None,
                   help="reference stage1.pth (torch) for the frozen prior")
    p.add_argument("--ref-indexer", type=str, default=None,
                   help="reference stage2_x{8,16}.pth (torch)")
    p.add_argument("--host-id", type=int, default=0)
    p.add_argument("--host-count", type=int, default=1)
    args = p.parse_args()
    cfg = load_yaml(args.opt, ExperimentConfig)
    pretrained = None
    if args.ref_g and args.ref_indexer:
        # reference torch checkpoints (GPEMSR.py:275-284 load semantics)
        import torch
        from gpemsr_tpu.models.convert import convert_lr_generator
        sd = torch.load(args.ref_g, map_location="cpu")
        idx_sd = torch.load(args.ref_indexer, map_location="cpu")
        refmodel = convert_lr_generator(sd, cfg.network.prior, indexer_sd=idx_sd)
        refmodel.pop("encoder", None)    # unused by the SR forward
        pretrained = {"refmodel": refmodel}
    elif args.prior_ckpt:
        payload = ckpt.restore(args.prior_ckpt)
        refmodel = dict(payload["frozen"])
        refmodel["indexer"] = payload["params"]["indexer"]
        refmodel.pop("encoder", None)
        pretrained = {"refmodel": refmodel}
    run_stage3(cfg, args.host_id, args.host_count, pretrained=pretrained)


if __name__ == "__main__":
    main()
