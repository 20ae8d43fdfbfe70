"""Shared chained-jit timing helper for the bench scripts.

This environment reaches the chip through a relay whose dispatch/fetch
overhead (~30 ms) dwarfs most kernels and whose block_until_ready does not
wait for remote execution, so per-dispatch timing measures the relay. The
honest method (bench.py docstring): chain the step ITERS times
data-dependently inside ONE jit, fetch once, take the min over reps, and
subtract a measured empty-chain overhead. bench.py keeps its own inlined
variant because it interleaves the provisional-result emit with the reps;
the analysis scripts (bench_dcn / bench_seg_parts / bench_profile /
bench_window_parts) all share this one.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timed_chain(step, init, iters, reps=3):
    """min wall-clock of `iters` chained applications of step inside one jit.

    step: c -> c' (any pytree); init: starting carry. Returns seconds for
    the WHOLE chain (divide by iters for per-step, after subtracting an
    empty-chain overhead measured with e.g. step=lambda c: c + 1.0).
    """
    @jax.jit
    def chained(c0):
        return jax.lax.fori_loop(0, iters, lambda i, c: step(c), c0)

    out = chained(init)
    _ = float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    ts = []
    for _r in range(reps):
        t0 = time.perf_counter()
        out = chained(init)
        _ = float(jax.tree_util.tree_leaves(out)[0]
                  .astype(jnp.float32).sum())
        ts.append(time.perf_counter() - t0)
    return min(ts)
