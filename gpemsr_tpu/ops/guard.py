"""Deferred exactness guards for windowed Pallas kernels (inference only).

The windowed DCN (`ops/dcn.py`) and flow warp (`ops/warp_pallas.py`) are
exact only when every non-zero bilinear corner lies inside their displacement
window, so by default each call wraps itself in a `lax.cond` choosing between
the Pallas kernel and the exact gather path. A full-section GPEMSR window
forward contains ~8 such calls (6 SpyNet warp levels + 2 DCN levels), and on
TPU each cond is a fusion barrier plus dispatch overhead — a device trace
measured ~6 ms/section of pure cond dispatch (docs/STATUS.md).

This module lets an INFERENCE caller hoist all of those conds into ONE:

    fast_or_exact = guard.with_deferred_guards(lambda lq: model.apply(...))
    sr = jax.jit(fast_or_exact)(lq)

Inside the wrapper the windowed kernels run unconditionally (straight-line,
fusable) while their exactness predicates are collected; a single lax.cond
then either keeps the fast result or recomputes the whole forward with every
windowed dispatch forced to the exact gather path. Semantics are identical
to the per-call guards for ANY offsets/flows; only the failure granularity
changes (one out-of-window sample recomputes the whole wrapped fn instead of
one op — guard misses are rare for trained models, and exactness is what
matters there).

Deferred mode is inference-only: it bypasses the custom_vjp that makes the
per-call guarded DCN differentiable. Training code paths never enter
`collect()`, so they are unaffected.

The context flags are thread-local: two exporters tracing concurrently in
one process (e.g. two streaming hosts sharing a process) each see their own
guard state. The flags only matter at trace time (the traced program is
fixed afterwards).
"""

from __future__ import annotations

import contextlib
import threading
from functools import reduce, wraps

import jax.numpy as jnp
from jax import lax


class _TraceState(threading.local):
    def __init__(self):
        self.collect_stack: list[list] = []
        self.force_exact: int = 0
        self.probe_stack: list[list] = []


_STATE = _TraceState()


def deferring() -> bool:
    """True while tracing inside a collect() context (and not force_exact)."""
    return bool(_STATE.collect_stack) and not _STATE.force_exact


def forcing_exact() -> bool:
    """True while tracing the exact-recompute branch."""
    return bool(_STATE.force_exact)


def record(ok) -> None:
    """Called by windowed dispatches in deferred mode with their predicate."""
    _STATE.collect_stack[-1].append(ok)


@contextlib.contextmanager
def collect():
    oks: list = []
    _STATE.collect_stack.append(oks)
    try:
        yield oks
    finally:
        _STATE.collect_stack.pop()


@contextlib.contextmanager
def force_exact():
    _STATE.force_exact += 1
    try:
        yield
    finally:
        _STATE.force_exact -= 1


def all_ok(oks):
    return reduce(jnp.logical_and, oks, jnp.asarray(True))


def with_host_guards(fn):
    """Straight-line variant of `with_deferred_guards` for streaming hosts:
    windowed kernels run unguarded and the collected exactness predicate is
    RETURNED instead of branched on — `wrapped(*args) -> (fn(*args), ok)`
    with `ok` a scalar bool. No `lax.cond` exists in the traced program at
    all (conds are fusion barriers on TPU and their fallback branch occupies
    the instruction stream even when never taken). The caller checks `ok`
    on the host — it fetches the outputs anyway — and re-dispatches the rare
    missed call through `with_forced_exact(fn)`. Per-call semantics match the
    guarded paths exactly: a miss is recomputed through the exact gather
    kernels, only the recompute granularity is the whole wrapped fn."""
    @wraps(fn)
    def wrapped(*args):
        with collect() as oks:
            fast = fn(*args)
        return fast, all_ok(oks)

    return wrapped


def with_forced_exact(fn):
    """The recompute partner of `with_host_guards`: every windowed dispatch
    inside `fn` is forced to the exact gather path."""
    @wraps(fn)
    def wrapped(*args):
        with force_exact():
            return fn(*args)

    return wrapped


def probing() -> bool:
    """True while tracing inside a `with_radius_probe` wrapper."""
    return bool(_STATE.probe_stack)


def record_needed(r) -> None:
    """Called by windowed dispatch sites in probe mode with the scalar
    minimum window radius their current operands require."""
    _STATE.probe_stack[-1].append(r)


def with_radius_probe(fn):
    """Measurement variant for sizing the serving window of a trained
    checkpoint: every windowed-capable DCN dispatch inside `fn` computes
    via the exact gather path (so it runs on ANY backend, CPU included)
    while recording the minimum window radius its offsets require.
    `wrapped(*args) -> (fn(*args), needed)` with `needed` an int32
    [n_calls, 2] array of per-dispatch (Ry, Rx) minimums in trace order —
    per-call because the L1 and cascade DCNs may need different windows,
    per-axis because the kernel supports Ru != Rv. The smallest SYMMETRIC
    `dcn_window_radius` passing every guard is `needed.max()`. Shape
    [0, 2] if `fn` contains no windowed-capable dispatches."""
    @wraps(fn)
    def wrapped(*args):
        needs: list = []
        _STATE.probe_stack.append(needs)
        try:
            out = fn(*args)
        finally:
            _STATE.probe_stack.pop()
        needed = (jnp.stack(needs) if needs
                  else jnp.zeros((0, 2), jnp.int32))
        return out, needed

    return wrapped


def with_deferred_guards(fn):
    """Wrap an inference fn so its windowed kernels run unguarded, with ONE
    lax.cond swapping in a full exact recompute when any guard failed.

    `fn` must be a pure jax function of array pytrees (e.g. a closed-over
    `model.apply`). Wrap BEFORE `jax.jit` so the contexts are active during
    tracing. If `fn` contains no windowed dispatches the wrapper is a no-op.
    """
    @wraps(fn)
    def wrapped(*args):
        with collect() as oks:
            fast = fn(*args)
        if not oks:
            return fast

        def slow(a):
            with force_exact():
                return fn(*a)

        return lax.cond(all_ok(oks), lambda a: fast, slow, args)

    return wrapped
