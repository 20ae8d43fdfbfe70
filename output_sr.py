"""SR export CLI (reference output_GPEMSR.py): slide a 5-frame window along
the z-stack and write SR PNGs.

Usage: python output_sr.py -opt configs/output_x16.yml
The config's `pretrain.EMSR` points at a stage-3 checkpoint dir."""

import argparse

from gpemsr_tpu.core.platform import init_platform

init_platform()
import os

import numpy as np

from gpemsr_tpu.core import checkpoint as ckpt
from gpemsr_tpu.core.config import ExperimentConfig, load_yaml
from gpemsr_tpu.utils.image import read_img


def load_lr_stack(lr_dir: str) -> np.ndarray:
    ids = sorted(int(os.path.splitext(f)[0]) for f in os.listdir(lr_dir)
                 if f.endswith(".png"))
    return np.stack([read_img(os.path.join(lr_dir, f"{i}.png")) for i in ids], 0)


def main():
    import jax
    import jax.numpy as jnp

    from gpemsr_tpu.infer.sr import sr_stack, sr_stack_streaming
    from gpemsr_tpu.models.gpemsr import GPEMSR
    from gpemsr_tpu.train.common import merge_params

    p = argparse.ArgumentParser()
    p.add_argument("-opt", type=str, required=True)
    p.add_argument("--out", type=str, default=None, help="output dir override")
    p.add_argument("--defer-guards", action="store_true",
                   help="one whole-forward exactness cond instead of one per "
                        "windowed kernel (ops/guard.py; same outputs)")
    p.add_argument("--guard-mode", type=str, default=None,
                   choices=["host", "defer", "percall"],
                   help="windowed-kernel exactness guards: host (default — "
                        "straight-line kernels, host-side recheck), defer "
                        "(one whole-forward cond), percall (one cond per "
                        "dispatch); same outputs in all modes")
    args = p.parse_args()
    cfg = load_yaml(args.opt, ExperimentConfig)

    lr_dir = cfg.datasets["test"].dataroot_LQ
    out_dir = args.out or os.path.join(cfg.root, cfg.name, "SR")
    stack = load_lr_stack(lr_dir)

    model = GPEMSR(cfg.network)
    src = cfg.pretrain["EMSR"]
    if str(src).endswith((".pth", ".pt")):
        # reference stage-3 torch checkpoint (strict=True layout,
        # output_GPEMSR.py:52)
        import torch
        from gpemsr_tpu.models.convert import convert_gpemsr
        sd = torch.load(src, map_location="cpu")
        params = {"params": convert_gpemsr(sd, cfg.network)}
    else:
        payload = ckpt.restore(src)
        model_frozen = {k: v for k, v in payload["frozen"].items()
                        if k != "cx_vgg"}
        params = {"params": merge_params(payload["params"], model_frozen)}

    # streaming: per-frame features computed once per slice and shared
    # across the 5 windows containing it (bit-identical, ~2x faster)
    sr_stack_streaming(model, params, stack, n_frames=cfg.network.nframes,
                       out_dir=out_dir, defer_guards=args.defer_guards,
                       guard_mode=args.guard_mode)
    print(f"wrote {stack.shape[0]} SR sections to {out_dir}")


if __name__ == "__main__":
    main()
