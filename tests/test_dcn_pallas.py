"""Differential tests for the Pallas windowed DCN kernel (interpret mode).

The kernel itself is TPU-only in production; pallas_call's interpret mode
lets us run the exact same kernel logic on CPU and compare it against the
XLA slab-gather formulation — including the window_ok guard's boundary
band (offsets landing exactly on / just past the window edge), where a
one-sided bound check used to let silently-dropped corners through.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpemsr_tpu.ops import dcn as dcn_mod
from gpemsr_tpu.ops import dcn_pallas
from gpemsr_tpu.ops.dcn import deform_conv2d, _deform_conv2d_xla
from gpemsr_tpu.ops.dcn_pallas import deform_conv2d_windowed, window_ok


@pytest.fixture
def interpret_mode():
    old = dcn_pallas.INTERPRET
    dcn_pallas.INTERPRET = True
    yield
    dcn_pallas.INTERPRET = old


def _rand_case(rng, B=1, H=8, W=8, C=16, G=4, off_scale=1.0):
    K = 9
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    offset = (rng.standard_normal((B, H, W, 2 * G * K)) * off_scale
              ).astype(np.float32)
    mask = rng.uniform(0.1, 1.0, (B, H, W, G * K)).astype(np.float32)
    w = (rng.standard_normal((K, C, C)) * 0.1).astype(np.float32)
    b = rng.standard_normal(C).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(w), jnp.asarray(b))


def test_windowed_kernel_matches_gather_interpret(rng, interpret_mode):
    x, offset, mask, w, b = _rand_case(rng, off_scale=1.5)
    offset = jnp.clip(offset, -2.4, 2.4)   # keep every corner in-window
    assert bool(window_ok(offset, mask, deformable_groups=4, radius=4,
                          H=8, W=8))
    out = deform_conv2d_windowed(x, offset, mask, w, b, deformable_groups=4,
                                 radius=4, sample_dtype=jnp.float32)
    ref = _deform_conv2d_xla(x, offset, mask, w, b, deformable_groups=4,
                             dense_threshold=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_window_ok_rejects_integer_offsets_past_radius(rng):
    # exactly-integer displacement one past the radius: corner 0 carries ALL
    # the weight (fy == 0 so corner 1's weight is zero) and sits OUT of the
    # window on the high side — the case a one-sided bound check misses.
    B, H, W, C, G = 1, 8, 8, 16, 4
    K = 9
    radius = 2
    offset = np.zeros((B, H, W, 2 * G * K), np.float32)
    offset[0, 4, 4, 0] = float(radius + 2)   # dy for (g0, k0); ry = radius+1
    mask = np.ones((B, H, W, G * K), np.float32)
    ok = window_ok(jnp.asarray(offset), jnp.asarray(mask),
                   deformable_groups=G, radius=radius, H=H, W=W)
    assert not bool(ok)

    # in-window integer displacement must still pass
    offset[0, 4, 4, 0] = float(radius - 1)
    ok = window_ok(jnp.asarray(offset), jnp.asarray(mask),
                   deformable_groups=G, radius=radius, H=H, W=W)
    assert bool(ok)


def test_guarded_dispatch_boundary_band_exact(rng, interpret_mode):
    # offsets drawn wide enough that some corners fall outside the window:
    # the guard must route to the gather path and stay exact.
    x, offset, mask, w, b = _rand_case(rng, off_scale=3.0)
    out = deform_conv2d(x, offset, mask, w, b, deformable_groups=4,
                        dense_threshold=8, window_radius=2)
    ref = _deform_conv2d_xla(x, offset, mask, w, b, deformable_groups=4,
                             dense_threshold=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_guarded_dispatch_in_window_exact(rng, interpret_mode):
    # offsets small enough that the Pallas branch is taken (window_ok True):
    # with f32 sampling it must agree with the gather path.
    x, offset, mask, w, b = _rand_case(rng, off_scale=0.5)
    ok = window_ok(offset, mask, deformable_groups=4, radius=4, H=8, W=8)
    assert bool(ok)
    out = deform_conv2d(x, offset, mask, w, b, deformable_groups=4,
                        dense_threshold=8, window_radius=4)
    ref = _deform_conv2d_xla(x, offset, mask, w, b, deformable_groups=4,
                             dense_threshold=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grad_through_windowed_dispatch(rng, interpret_mode):
    # jax.grad through the guarded dispatch: the custom_vjp backward
    # re-linearizes through the gather path, so gradients match it exactly.
    x, offset, mask, w, b = _rand_case(rng, off_scale=0.5)

    def loss_windowed(x, offset, w):
        out = deform_conv2d(x, offset, mask, w, b, deformable_groups=4,
                            dense_threshold=8, window_radius=4)
        return jnp.sum(out ** 2)

    def loss_xla(x, offset, w):
        out = _deform_conv2d_xla(x, offset, mask, w, b, deformable_groups=4,
                                 dense_threshold=0)
        return jnp.sum(out ** 2)

    gx, go, gw = jax.grad(loss_windowed, argnums=(0, 1, 2))(x, offset, w)
    rx, ro, rw = jax.grad(loss_xla, argnums=(0, 1, 2))(x, offset, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(go), np.asarray(ro),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)


def test_anisotropic_radius_matches_gather(rng, interpret_mode):
    """(Ry, Rx) windows: exact whenever y-corners fit Ry and x-corners fit
    Rx — the trained x8 checkpoint's cascade probes at (6, 4), so per-axis
    sizing is a production configuration, not a corner case."""
    x, offset, mask, w, b = _rand_case(rng, H=16, W=16)
    K = 9
    off = np.asarray(offset).reshape(1, 16, 16, 4, K, 2).copy()
    off[..., 0] = np.clip(off[..., 0] * 3.0, -4.4, 4.4)   # dy within Ry=6
    off[..., 1] = np.clip(off[..., 1], -1.4, 1.4)         # dx within Rx=3
    offset = jnp.asarray(off.reshape(1, 16, 16, 2 * 4 * K))
    assert bool(window_ok(offset, mask, deformable_groups=4, radius=(6, 3),
                          H=16, W=16))
    # the same offsets overflow a symmetric window of the x size
    assert not bool(window_ok(offset, mask, deformable_groups=4, radius=3,
                              H=16, W=16))
    out = deform_conv2d_windowed(x, offset, mask, w, b, deformable_groups=4,
                                 radius=(6, 3), sample_dtype=jnp.float32)
    ref = _deform_conv2d_xla(x, offset, mask, w, b, deformable_groups=4,
                             dense_threshold=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_anisotropic_radius_guarded_dispatch(rng, interpret_mode):
    """deform_conv2d accepts a (Ry, Rx) window_radius end-to-end (guard +
    kernel + gather fallback) and stays exact on both guard outcomes."""
    x, offset, mask, w, b = _rand_case(rng, H=16, W=16)
    ref = _deform_conv2d_xla(x, offset, mask, w, b, deformable_groups=4,
                             dense_threshold=0)
    for radius in ((6, 3), (2, 5)):
        out = deform_conv2d(x, offset, mask, w, b, deformable_groups=4,
                            dense_threshold=0, window_radius=radius,
                            sample_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


def test_force_dense_radius(rng):
    """window_radius=-1 forces the dense one-hot path regardless of
    dense_threshold — exact, guard-free (the x8 protocol cascade crossover)."""
    x, offset, mask, w, b = _rand_case(rng)
    ref = _deform_conv2d_xla(x, offset, mask, w, b, deformable_groups=4,
                             dense_threshold=10 ** 9)   # dense reference
    out = deform_conv2d(x, offset, mask, w, b, deformable_groups=4,
                        dense_threshold=0, window_radius=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
