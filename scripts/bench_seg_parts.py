"""Localize seg-protocol time: pure UNet forward (chained iterations inside
one jit, relay overhead subtracted) vs the full tiled_infer fold pipeline.

    python scripts/bench_seg_parts.py [batch] [--f32]

The protocol runs 845 crops; pure-model time x ceil(845/batch) ~= the
unavoidable compute. The gap to tiled_infer is fold/slice overhead."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from _bench_util import timed_chain  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpemsr_tpu.infer.tiled3d import TileProtocol, tiled_infer
    from gpemsr_tpu.models.seg.superhuman import UNetSuperhuman
    from gpemsr_tpu.utils.precision import bf16_inference

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 4
    use_bf16 = "--f32" not in sys.argv
    iters = 8

    model = UNetSuperhuman()
    sample = jnp.zeros((batch, 18, 160, 160, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    if use_bf16:
        apply_fn = bf16_inference(lambda v, x: model.apply(v, x), variables)
    else:
        apply_fn = lambda x: model.apply(variables, x)   # noqa: E731

    overhead = timed_chain(lambda c: c + 1.0, jnp.ones((8, 128),
                                                       jnp.float32), iters)

    rng = np.random.default_rng(0)
    crop = jnp.asarray(rng.uniform(0, 1, (batch, 18, 160, 160, 1))
                       .astype(np.float32))

    def step(c):
        x = crop + 1e-6 * c.astype(jnp.float32).mean()
        return apply_fn(x).astype(jnp.float32)

    t = (timed_chain(step, jnp.zeros((batch, 18, 160, 160, 3), jnp.float32),
                     iters)
         - overhead) / iters
    n_crops = 5 * 13 * 13
    n_steps = -(-n_crops // batch)
    print(f"pure UNet fwd (batch={batch}, bf16={use_bf16}): {t*1000:.1f} ms "
          f"/step -> {n_steps * t:.1f}s for {n_crops} crops "
          f"({batch * 708.5 / 4 / t / 1000:.1f} TFLOP/s)")

    vol = rng.uniform(0, 1, (50, 1024, 1024)).astype(np.float32)
    jit_apply = jax.jit(apply_fn)
    for rep in range(2):
        t0 = time.perf_counter()
        tiled_infer(jit_apply, vol, TileProtocol.superhuman(), batch=batch)
        dt = time.perf_counter() - t0
        tag = "compile+run" if rep == 0 else "steady"
        print(f"tiled_infer {tag}: {dt:.1f}s")


if __name__ == "__main__":
    main()
