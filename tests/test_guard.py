"""Deferred-guard inference wrapper (ops/guard.py).

`with_deferred_guards` must be semantically identical to the per-call
guarded dispatches for ANY inputs: windowed kernels run unguarded on the
fast path, and one lax.cond recomputes the whole wrapped fn through the
exact gather paths when any exactness predicate fails. Kernels run in
pallas interpret mode on CPU (as in test_dcn_pallas.py / test_ops.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpemsr_tpu.ops import dcn_pallas, guard, warp_pallas
from gpemsr_tpu.ops.dcn import _deform_conv2d_xla, deform_conv2d
from gpemsr_tpu.ops.warp import flow_warp
from gpemsr_tpu.ops.warp_pallas import spynet_flow_warp


@pytest.fixture
def interpret_mode():
    old_d, old_w = dcn_pallas.INTERPRET, warp_pallas.INTERPRET
    dcn_pallas.INTERPRET = warp_pallas.INTERPRET = True
    yield
    dcn_pallas.INTERPRET, warp_pallas.INTERPRET = old_d, old_w


def _dcn_case(rng, off_scale=1.0, B=1, H=8, W=8, C=16, G=4):
    K = 9
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    offset = (rng.standard_normal((B, H, W, 2 * G * K)) * off_scale
              ).astype(np.float32)
    mask = rng.uniform(0.1, 1.0, (B, H, W, G * K)).astype(np.float32)
    w = (rng.standard_normal((K, C, C)) * 0.1).astype(np.float32)
    b = rng.standard_normal(C).astype(np.float32)
    return tuple(jnp.asarray(t) for t in (x, offset, mask, w, b))


def _dcn(x, offset, mask, w, b):
    # dense_threshold=0 so the 8x8 map takes the windowed (guarded) route
    return deform_conv2d(x, offset, mask, w, b, deformable_groups=4,
                         dense_threshold=0, window_radius=4,
                         sample_dtype=jnp.float32)


def _dcn_exact(x, offset, mask, w, b):
    return _deform_conv2d_xla(x, offset, mask, w, b, deformable_groups=4,
                              dense_threshold=0)


def test_deferred_dcn_in_window_matches_guarded(rng, interpret_mode):
    args = _dcn_case(rng, off_scale=0.5)
    wrapped = guard.with_deferred_guards(_dcn)
    np.testing.assert_allclose(np.asarray(wrapped(*args)),
                               np.asarray(_dcn(*args)), rtol=1e-5, atol=1e-5)


def test_deferred_dcn_out_of_window_falls_back_exact(rng, interpret_mode):
    x, offset, mask, w, b = _dcn_case(rng, off_scale=0.5)
    # past radius 4 but still inside the image (out-of-image corners carry
    # zero weight and so never violate the window)
    offset = offset.at[0, 0, 0, 0].set(6.5)
    from gpemsr_tpu.ops.dcn_pallas import window_ok
    assert not bool(window_ok(offset, mask, deformable_groups=4, radius=4,
                              H=8, W=8))
    wrapped = guard.with_deferred_guards(_dcn)
    np.testing.assert_allclose(np.asarray(wrapped(x, offset, mask, w, b)),
                               np.asarray(_dcn_exact(x, offset, mask, w, b)),
                               rtol=1e-5, atol=1e-5)


def test_deferred_warp_in_and_out_of_window(rng, interpret_mode):
    B, H, W, C = 1, 16, 128, 3
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    wrapped = guard.with_deferred_guards(
        lambda xx, ff: spynet_flow_warp(xx, ff, radius=8))

    flow = jnp.asarray(np.clip(
        rng.standard_normal((B, H, W, 2)) * 2.5, -6, 6).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(wrapped(x, flow)),
        np.asarray(flow_warp(x, flow, padding_mode="border")), atol=1e-5)

    flow_big = flow.at[0, H // 2, 5, 0].set(40.0)   # past radius 8
    np.testing.assert_allclose(
        np.asarray(wrapped(x, flow_big)),
        np.asarray(flow_warp(x, flow_big, padding_mode="border")), atol=1e-5)


def test_deferred_mixed_calls_one_miss_recomputes_all(rng, interpret_mode):
    """Two windowed DCNs inside one fn; a miss in the SECOND must produce the
    exact result for BOTH (whole-fn fallback), under jit."""
    x, offset, mask, w, b = _dcn_case(rng, off_scale=0.5)
    off_bad = offset.at[0, 0, 0, 1].set(6.5)   # in-image, past the radius

    def two_dcns(o1, o2):
        h = _dcn(x, o1, mask, w, b)
        return _dcn(h, o2, mask, w, b)

    def two_exact(o1, o2):
        h = _dcn_exact(x, o1, mask, w, b)
        return _dcn_exact(h, o2, mask, w, b)

    wrapped = jax.jit(guard.with_deferred_guards(two_dcns))
    np.testing.assert_allclose(np.asarray(wrapped(offset, off_bad)),
                               np.asarray(two_exact(offset, off_bad)),
                               rtol=1e-4, atol=1e-4)
    # and the all-ok case still matches the fast path
    np.testing.assert_allclose(np.asarray(wrapped(offset, offset)),
                               np.asarray(two_exact(offset, offset)),
                               rtol=1e-4, atol=1e-4)


def test_host_guards_returns_ok_and_fast_result(rng, interpret_mode):
    """with_host_guards: in-window inputs -> (guarded-path result, ok=True);
    no lax.cond may appear in the traced program."""
    args = _dcn_case(rng, off_scale=0.5)
    wrapped = guard.with_host_guards(_dcn)
    fast, ok = wrapped(*args)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(_dcn(*args)),
                               rtol=1e-5, atol=1e-5)
    jaxpr = jax.make_jaxpr(wrapped)(*args)
    assert "cond" not in str(jaxpr)


def test_host_guards_miss_then_forced_exact_matches(rng, interpret_mode):
    """with_host_guards on an out-of-window offset: ok=False, and the
    with_forced_exact re-dispatch reproduces the exact gather result —
    the full host-side protocol sr_stack_streaming uses."""
    x, offset, mask, w, b = _dcn_case(rng, off_scale=0.5)
    offset = offset.at[0, 0, 0, 0].set(6.5)   # in-image, past radius 4
    wrapped = jax.jit(guard.with_host_guards(_dcn))
    exact = jax.jit(guard.with_forced_exact(_dcn))
    fast, ok = wrapped(x, offset, mask, w, b)
    assert not bool(ok)
    np.testing.assert_allclose(np.asarray(exact(x, offset, mask, w, b)),
                               np.asarray(_dcn_exact(x, offset, mask, w, b)),
                               rtol=1e-5, atol=1e-5)


def test_host_guards_noop_fn_ok_true(rng):
    wrapped = guard.with_host_guards(lambda t: t * 3)
    out, ok = wrapped(jnp.arange(4.0))
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.arange(4.0) * 3))
    assert not guard.deferring() and not guard.forcing_exact()


def test_wrapper_noop_without_windowed_calls(rng):
    wrapped = guard.with_deferred_guards(lambda t: t * 2 + 1)
    t = jnp.arange(8.0)
    np.testing.assert_array_equal(np.asarray(wrapped(t)), np.asarray(t * 2 + 1))
    assert not guard.deferring() and not guard.forcing_exact()


def test_context_flags_restore_on_error():
    def boom(_):
        raise RuntimeError("x")
    with pytest.raises(RuntimeError):
        guard.with_deferred_guards(boom)(jnp.zeros(()))
    assert not guard.deferring() and not guard.forcing_exact()


def test_needed_radius_consistent_with_window_ok(rng):
    # window_ok(r) must hold exactly for r >= window_needed_radius — pinned
    # over random offsets at several magnitudes, including exactly-integer
    # offsets (whose +1 corner sits one past the floor displacement).
    for off_scale in (0.5, 2.0, 5.0):
        _x, offset, mask, _w, _b = _dcn_case(rng, off_scale=off_scale)
        need = int(jnp.max(dcn_pallas.window_needed_radius(
            offset, mask, deformable_groups=4, H=8, W=8)))
        for r in range(max(need - 2, 1), need + 3):
            assert bool(dcn_pallas.window_ok(
                offset, mask, deformable_groups=4, radius=r, H=8, W=8)
            ) == (r >= need), (off_scale, need, r)
    # exactly-integer offset: all weight on corner 0 (|ry| = 3), the +1
    # corner carries zero weight and is exempt — need is 3, not 4
    _x, offset, mask, _w, _b = _dcn_case(rng, off_scale=0.0)
    offset = offset.at[0, 3, 3, 0].set(4.0)   # dy for (g0, k0): py = 3.0
    need_yx = np.asarray(dcn_pallas.window_needed_radius(
        offset, mask, deformable_groups=4, H=8, W=8))
    need = int(need_yx.max())
    assert need == 3
    assert need_yx[0] == 3 and need_yx[1] <= 1   # pure-dy displacement
    assert bool(dcn_pallas.window_ok(offset, mask, deformable_groups=4,
                                     radius=3, H=8, W=8))
    assert not bool(dcn_pallas.window_ok(offset, mask, deformable_groups=4,
                                         radius=2, H=8, W=8))


def test_radius_probe_records_and_matches_exact(rng):
    # Probe mode: exact-gather output, max needed radius returned; works
    # without a TPU and without interpret mode.
    args = _dcn_case(rng, off_scale=2.0)
    probed = guard.with_radius_probe(_dcn)
    out, needed = probed(*args)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_dcn_exact(*args)),
                               rtol=1e-5, atol=1e-5)
    x, offset, mask, w, b = args
    assert needed.shape == (1, 2)
    np.testing.assert_array_equal(
        np.asarray(needed[0]),
        np.asarray(dcn_pallas.window_needed_radius(
            offset, mask, deformable_groups=4, H=8, W=8)))
    assert not guard.probing()
    # no windowed-capable dispatches -> empty [0, 2]
    _out, none_needed = guard.with_radius_probe(lambda t: t * 2)(jnp.ones(3))
    assert none_needed.shape == (0, 2)
