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
    p.add_argument("--host-id", type=int, default=0)
    p.add_argument("--host-count", type=int, default=1)
    args = p.parse_args()
    cfg = load_yaml(args.opt, ExperimentConfig)
    pretrained = None
    if args.prior_ckpt:
        payload = ckpt.restore(args.prior_ckpt)
        refmodel = dict(payload["frozen"])
        refmodel["indexer"] = payload["params"]["indexer"]
        pretrained = {"refmodel": refmodel}
    run_stage3(cfg, args.host_id, args.host_count, pretrained=pretrained)


if __name__ == "__main__":
    main()
