"""Training-step benchmark: full-size stage-3 GPEMSR train step at the
reference's training shapes (GT 256^2, LQ 16^2, N=5) on the current
accelerator.

    python scripts/bench_train.py [batch] [--bf16]

--bf16: bf16 compute (f32 master weights), the ParallelConfig.compute_dtype
path — compare against the f32 default."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from gpemsr_tpu.core.config import TrainConfig
    from gpemsr_tpu.train.stage3 import init_stage3, make_stage3_step

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 2
    compute_dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    cfg = _flagship_cfg()
    tcfg = TrainConfig(ref_loss_factor=0.01)

    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(0, 1, (batch, 5, 16, 16, 1)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (batch, 256, 256, 1)).astype(np.float32))

    t0 = time.perf_counter()
    model, state, frozen = init_stage3(jax.random.PRNGKey(0), cfg, tcfg, lq)
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)
    step = make_stage3_step(model, tcfg, compute_dtype=compute_dtype)

    t0 = time.perf_counter()
    state, m = step(state, frozen, lq, gt)
    jax.block_until_ready(state.params)
    print(f"first step (compile) {time.perf_counter() - t0:.1f}s", flush=True)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, frozen, lq, gt)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters
    print(f"stage-3 train step (batch={batch}): {dt * 1000:.1f} ms "
          f"({batch / dt:.2f} samples/s)  rec={float(m['rec_loss']):.4f} "
          f"ref={float(m.get('ref_loss', 0)):.4f}")


if __name__ == "__main__":
    main()
