"""Segmentation inference benchmark: the reference's 845-crop superhuman
protocol wall-clock (inference_seg.py:113-127) on the current accelerator.

Runs the tiled 3-D inference over a synthetic 50x1024x1024 volume with the
full-size UNetSuperhuman and prints crops/sec + projected protocol time."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gpemsr_tpu.infer.tiled3d import TileProtocol, tiled_infer
    from gpemsr_tpu.models.seg.superhuman import UNetSuperhuman
    from gpemsr_tpu.utils.precision import bf16_inference

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    model = UNetSuperhuman()
    sample = jnp.zeros((batch, 18, 160, 160, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    apply_fn = jax.jit(bf16_inference(
        lambda v, x: model.apply(v, x), variables))

    rng = np.random.default_rng(0)
    vol = rng.uniform(0, 1, (50, 1024, 1024)).astype(np.float32)

    # first run compiles; second run is the steady-state protocol time
    t0 = time.perf_counter()
    tiled_infer(apply_fn, vol, TileProtocol.superhuman(), batch=batch)
    compile_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    affs = tiled_infer(apply_fn, vol, TileProtocol.superhuman(), batch=batch)
    dt = time.perf_counter() - t0
    n_crops = 5 * 13 * 13
    print(f"superhuman tiled inference: {dt:.2f}s steady-state "
          f"({n_crops / dt:.1f} crops/s, batch={batch}; first run incl. "
          f"compile {compile_dt:.1f}s), affs {affs.shape}")


if __name__ == "__main__":
    main()
