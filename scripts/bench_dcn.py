"""Microbenchmark: DCNv2 strategies at the L1 full-section inference shape.

The round-1 profile attributed ~50 ms/section to the slab-gather DCN at the
L1 level (H=W=64 LR grid, 5 frames). This measures candidate TPU
implementations on the real chip.

Timing method: the axon relay has ~30 ms dispatch/fetch overhead and
`block_until_ready` does not wait for remote execution, so each variant is
chained data-dependently N times inside ONE jit (carry feeds the next input
and perturbs the offsets so no stage is loop-invariant-hoisted), fetched
once, with the empty-chain overhead subtracted.

Usage: python scripts/bench_dcn.py [--bf16]
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _bench_util import timed_chain  # noqa: E402
from gpemsr_tpu.ops.dcn import deform_conv2d  # noqa: E402

B, H, W, Cin = 5, 64, 64, 64
G, K = 8, 9
Cg = Cin // G
Q = H * W


def main():
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, H, W, Cin)), dtype)
    off0 = jnp.asarray(rng.uniform(-4, 4, (B, H, W, 2 * G * K)), jnp.float32)
    mask0 = jax.nn.sigmoid(
        jnp.asarray(rng.standard_normal((B, H, W, G * K)), jnp.float32)) * 2
    w = jnp.asarray(rng.standard_normal((K, Cin, Cin)) * 0.05, dtype)

    iters = 8
    oh = timed_chain(lambda c: c + 1.0, jnp.ones((8, 128), jnp.float32),
                     iters=iters)
    print(f"chain overhead: {oh*1e3:8.2f} ms")

    def bench(name, dcn):
        def step(c):
            # offsets perturbed by the carry -> nothing hoists out of the loop
            off = off0 + 1e-6 * c.astype(jnp.float32).mean()
            out = dcn(c, off, mask0, w)
            return out.astype(dtype)

        try:
            t = (timed_chain(step, x0, iters=iters) - oh) / iters
            print(f"{name}: {t*1e3:8.3f} ms")
            return t
        except Exception as e:  # noqa: BLE001
            print(f"{name}: failed ({type(e).__name__}: {str(e)[:200]})")
            return None

    bench("slab-gather", lambda *a: deform_conv2d(*a, dense_threshold=1024))
    bench("dense 1-hot", lambda *a: deform_conv2d(*a, dense_threshold=Q))

    from gpemsr_tpu.ops.dcn_pallas import deform_conv2d_windowed
    for rad in (4, 6, 8):
        bench(f"pallas r={rad}", lambda *a, rad=rad: deform_conv2d_windowed(
            *a, deformable_groups=G, radius=rad, sample_dtype=jnp.bfloat16))
    bench("pallas r=6 f32", lambda *a: deform_conv2d_windowed(
        *a, deformable_groups=G, radius=6, sample_dtype=jnp.float32))


if __name__ == "__main__":
    main()
