"""Downstream segmentation evaluation CLI (reference inference_code/inference_seg.py):
tiled 3-D affinity inference + watershed + agglomeration + VOI/ARAND.

Usage: python run_seg_eval.py -c configs/seg_x16_superhuman.yml \
          [--ckpt path/to/converted_params.pkl] [--out Result/...]"""

import argparse

from gpemsr_tpu.core.platform import init_platform

init_platform()
import os
import pickle

import numpy as np

from gpemsr_tpu.core.config import SegConfig, load_yaml


def main():
    import jax
    import jax.numpy as jnp

    from gpemsr_tpu.models.seg.mala import UNetMALA
    from gpemsr_tpu.models.seg.superhuman import UNetSuperhuman
    from gpemsr_tpu.seg.inference import (evaluate_segmentation, load_labels,
                                          load_sr_volume)

    p = argparse.ArgumentParser()
    p.add_argument("-c", "--cfg", type=str, required=True)
    p.add_argument("--ckpt", type=str, default=None,
                   help="pickled flax params (e.g. converted from torch .pt)")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("-ts", "--test-split", type=int, default=None)
    p.add_argument("--show", action="store_true",
                   help="write affinity / segmentation PNG galleries "
                        "(reference inference_seg.py --show)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 model compute (affinities return f32)")
    p.add_argument("--fetch-f16", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fetch affinities device->host as f16 — halves the "
                        "dominant transfer; measured VOI delta -0.012 "
                        "(noise-level, scripts/bench_seg_fetch.py). "
                        "--no-fetch-f16 restores the f32 fetch")
    p.add_argument("--fetch-u8", action="store_true",
                   help="fetch affinities as u8 (waterz queue is 256-bin "
                        "discretized anyway) + the watershed boundary map "
                        "computed on device and fetched f16 — ~262 MB vs "
                        "f16's ~314 MB; guard deltas in "
                        "scripts/bench_seg_fetch.py")
    args = p.parse_args()
    cfg = load_yaml(args.cfg, SegConfig)
    if args.test_split:
        cfg.data.test_split = args.test_split

    if cfg.model.model_type == "superhuman":
        model = UNetSuperhuman(filters=tuple(cfg.model.filters),
                               out_planes=cfg.model.output_nc,
                               if_sigmoid=cfg.model.if_sigmoid)
        sample = jnp.zeros((1, 18, 160, 160, 1), jnp.float32)
    else:
        model = UNetMALA(out_planes=cfg.model.output_nc,
                         if_sigmoid=cfg.model.if_sigmoid)
        sample = jnp.zeros((1, 53, 268, 268, 1), jnp.float32)

    if args.ckpt and args.ckpt.endswith((".pt", ".pth")):
        # reference torch checkpoint: strip DDP 'module.' prefix and convert
        import torch
        from gpemsr_tpu.models.convert import convert_mala, convert_superhuman
        raw = torch.load(args.ckpt, map_location="cpu")
        sd = raw.get("model_weights", raw)
        sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
        variables = (convert_superhuman(sd)
                     if cfg.model.model_type == "superhuman"
                     else convert_mala(sd))
    elif args.ckpt:
        with open(args.ckpt, "rb") as f:
            variables = pickle.load(f)
    else:
        print("WARNING: no checkpoint given; using random init (protocol "
              "smoke-run only)")
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample)

    # variables ride as a jit ARGUMENT (params=), not closure constants:
    # MALA's ~84M params would otherwise serialize into the compiled graph
    # (HTTP 413 on remote-compile backends)
    if args.bf16:
        from gpemsr_tpu.utils.precision import cast_floats
        variables = cast_floats(variables, jnp.bfloat16)

        def apply_fn(v, x):
            return model.apply(v, x.astype(jnp.bfloat16)).astype(jnp.float32)
    else:
        def apply_fn(v, x):
            return model.apply(v, x)

    raw = load_sr_volume(cfg.data.data_folder, cfg.data.im_path,
                         test_split=cfg.data.test_split)
    labels = load_labels(os.path.join(cfg.data.data_folder,
                                      cfg.data.label_file),
                         cfg.data.test_split)
    out_dir = args.out or os.path.join("Result", cfg.model.model_type)
    fdt = np.uint8 if args.fetch_u8 else (
        np.float16 if args.fetch_f16 else None)
    scores = evaluate_segmentation(apply_fn, raw, labels, cfg, out_dir,
                                   show=args.show, params=variables,
                                   fetch_dtype=fdt)
    print(scores.line())


if __name__ == "__main__":
    main()
