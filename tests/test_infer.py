"""Tiled 3-D inference tests: grid coverage, Gaussian blending correctness,
batched == unbatched, MALA valid-conv geometry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpemsr_tpu.infer.tiled3d import TileProtocol, gaussian_weight, tiled_infer


def small_proto():
    return TileProtocol(crop=(6, 16, 16), stride=(4, 8, 8), pad=(2, 4, 4))


def test_positions_cover_volume():
    proto = TileProtocol.superhuman()
    padded = (58, 1120, 1120)      # 50 + 2*4, 1024 + 2*48
    pos = proto.positions(padded)
    # 5 z positions x 13 x 13 = 845 crops (provider_valid.py grid)
    assert len(pos) == 5 * 13 * 13
    zs = sorted({p[0] for p in pos})
    assert zs[0] == 0 and zs[-1] == padded[0] - proto.crop[0]


def test_gaussian_weight_properties():
    w = gaussian_weight((18, 160, 160))
    assert w.shape == (18, 160, 160)
    assert w.max() <= 1.0 + 1e-6
    c = w[9, 80, 80]
    assert c > w[0, 0, 0]          # center-weighted


def _mean_apply(crop):
    """Toy seg model: channel c = crop value shifted by c/10 (deterministic)."""
    base = crop[..., 0]
    return jnp.stack([base, base + 0.1, base + 0.2], axis=-1)


def test_tiled_infer_blend_reconstructs_smooth_field(rng):
    vol = rng.uniform(0, 1, (10, 32, 32)).astype(np.float32)
    proto = small_proto()
    out = tiled_infer(jax.jit(_mean_apply), vol, proto, batch=4)
    assert out.shape == (3, 10, 32, 32)
    # toy model is the identity per-channel (+offset); blending must
    # reproduce the volume exactly wherever crops fully cover it
    np.testing.assert_allclose(out[0], vol, atol=1e-4)
    np.testing.assert_allclose(out[1], vol + 0.1, atol=1e-4)


def test_tiled_infer_batching_equivalence(rng):
    vol = rng.uniform(0, 1, (10, 32, 32)).astype(np.float32)
    proto = small_proto()
    a = tiled_infer(jax.jit(_mean_apply), vol, proto, batch=1)
    b = tiled_infer(jax.jit(_mean_apply), vol, proto, batch=5)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_tiled_infer_mala_geometry(rng):
    # valid-conv protocol: output crop maps onto the unpadded volume
    proto = TileProtocol(crop=(9, 20, 20), stride=(5, 8, 8), pad=(2, 6, 6),
                         net_crop=(2, 6, 6), blend=False)
    vol = rng.uniform(0, 1, (10, 16, 16)).astype(np.float32)

    def valid_apply(crop):
        inner = crop[:, 2:-2, 6:-6, 6:-6, 0]
        return jnp.stack([inner, inner, inner], axis=-1)

    out = tiled_infer(jax.jit(valid_apply), vol, proto)
    assert out.shape == (3, 10, 16, 16)
    np.testing.assert_allclose(out[0], vol, atol=1e-5)
