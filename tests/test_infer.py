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


def test_tiled_infer_fetch_f16_close(rng):
    """f16 device->host fetch (halved transfer bytes) stays within f16's
    ~5e-4 resolution of the f32 protocol — the guard for --fetch-f16."""
    vol = rng.uniform(0, 1, (10, 32, 32)).astype(np.float32)
    proto = small_proto()
    a32 = tiled_infer(jax.jit(_mean_apply), vol, proto, batch=4)
    a16 = tiled_infer(jax.jit(_mean_apply), vol, proto, batch=4,
                      fetch_dtype=np.float16)
    assert a16.dtype == np.float32
    assert np.abs(a32 - a16).max() < 7e-4


def test_tiled_infer_fetch_u8_with_device_boundary(rng):
    """u8 affinity fetch + device-computed f16 boundary (the --fetch-u8
    protocol): affinities within u8's 1/255 quantum of the f32 run, the
    boundary within f16 resolution of 1 - 0.5*(a[1]+a[2]) computed from the
    UNquantized affinities, and watershed(boundary=...) == watershed on the
    f32 affinities."""
    from gpemsr_tpu.seg.watershed import watershed

    vol = rng.uniform(0, 1, (10, 32, 32)).astype(np.float32)
    proto = small_proto()
    a32 = tiled_infer(jax.jit(_mean_apply), vol, proto, batch=4)
    a8, bdry = tiled_infer(jax.jit(_mean_apply), vol, proto, batch=4,
                           fetch_dtype=np.uint8, fetch_boundary=True)
    assert a8.dtype == np.float32 and bdry.dtype == np.float32
    assert a8.shape == a32.shape and bdry.shape == a32.shape[1:]
    # u8 clamps to [0,1]; real affinities are sigmoided so only the toy
    # model's base+0.2 channel exceeds it
    assert np.abs(np.clip(a32, 0, 1) - a8).max() <= 0.5 / 255 + 1e-6
    want_b = 1.0 - 0.5 * (a32[1] + a32[2])
    assert np.abs(bdry - want_b).max() < 7e-4
    # boundary= plumbing: an exact boundary must reproduce the default path
    # bit-for-bit regardless of the (u8) affinities passed alongside. (The
    # f16-rounded boundary legitimately shifts fragment ids on random
    # fields; its end-to-end quality guard is the VOI delta in
    # scripts/bench_seg_fetch.py.)
    np.testing.assert_array_equal(
        watershed(a8, "maxima_distance", boundary=want_b),
        watershed(a32, "maxima_distance"))


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


def test_spatial_sharded_sr(rng):
    """Full-section SR sharded over the mesh 'spatial' axis matches the same
    tiling computed serially (GroupNorm makes tiling != whole-image, exactly
    like the reference's quarter-tiled validation protocol)."""
    from gpemsr_tpu.core.config import GPEMSRConfig
    from gpemsr_tpu.infer.spatial import pad_to_tiles, spatial_sr
    from gpemsr_tpu.models.gpemsr import GPEMSR
    from gpemsr_tpu.parallel.mesh import make_mesh
    from tests.test_models import tiny_prior

    cfg = GPEMSRConfig(nf=16, groups=4, front_RBs=1, back_RBs=1,
                       ref_fusion_feat_RBs=1, scale=16, prior=tiny_prior(16))
    model = GPEMSR(cfg)
    lr = jnp.asarray(rng.uniform(0, 1, (1, 5, 32, 8, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), lr[:, :, :8, :8])

    mesh = make_mesh(data=4, spatial=2)
    halo = 8
    out = spatial_sr(model, params, np.asarray(lr), mesh, halo=halo, scale=16)
    assert out.shape == (1, 512, 128, 1)

    # serial reference: same tiles, same crops
    tiles = pad_to_tiles(lr, 2, halo)
    parts = []
    for t in range(2):
        sr, _ = model.apply(params, tiles[:, t])
        parts.append(np.asarray(sr[0, halo * 16: sr.shape[1] - halo * 16]))
    ref = np.concatenate(parts, axis=0)[None]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_streaming_sr_matches_per_window(rng):
    """Streaming (per-slice feature reuse) == per-window forward, exactly."""
    from gpemsr_tpu.core.config import GPEMSRConfig
    from gpemsr_tpu.infer.sr import sr_stack, sr_stack_streaming
    from gpemsr_tpu.models.gpemsr import GPEMSR
    from tests.test_models import tiny_prior

    cfg = GPEMSRConfig(nf=16, groups=4, front_RBs=1, back_RBs=1,
                       ref_fusion_feat_RBs=1, scale=16, prior=tiny_prior(16))
    model = GPEMSR(cfg)
    stack = rng.uniform(0, 1, (6, 8, 8, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 5, 8, 8, 1), jnp.float32))
    apply_fn = jax.jit(lambda lq: model.apply(params, lq))
    a = sr_stack(apply_fn, stack)
    b = sr_stack_streaming(model, params, stack)
    # batch-size-dependent float accumulation order can flip uint8 rounding
    # on a handful of pixels; outputs must agree within one grey level
    np.testing.assert_allclose(a.astype(int), b.astype(int), atol=1)
    assert np.mean(a != b) < 0.01


def test_tiled_infer_params_argument(rng):
    """params= passes variables as a jit argument (apply_fn(params, crop))
    instead of closure constants; results identical to the closure path for
    both the blended and the MALA valid-conv route."""
    vol = rng.uniform(0, 1, (10, 32, 32)).astype(np.float32)
    proto = small_proto()
    scale = {"s": jnp.asarray(2.0)}

    def with_params(p, crop):
        return _mean_apply(crop) * p["s"]

    a = tiled_infer(jax.jit(lambda c: _mean_apply(c) * 2.0), vol, proto,
                    batch=4)
    b = tiled_infer(with_params, vol, proto, batch=4, params=scale)
    np.testing.assert_allclose(a, b, atol=1e-5)

    mproto = TileProtocol(crop=(9, 20, 20), stride=(5, 8, 8), pad=(2, 6, 6),
                          net_crop=(2, 6, 6), blend=False)
    mvol = rng.uniform(0, 1, (10, 16, 16)).astype(np.float32)

    def valid_apply(crop):
        inner = crop[:, 2:-2, 6:-6, 6:-6, 0]
        return jnp.stack([inner, inner, inner], axis=-1)

    am = tiled_infer(jax.jit(lambda c: valid_apply(c) * 2.0), mvol, mproto)
    bm = tiled_infer(lambda p, c: valid_apply(c) * p["s"], mvol, mproto,
                     params=scale)
    np.testing.assert_allclose(am, bm, atol=1e-5)


def test_streaming_sr_defer_guards_matches(rng):
    """sr_stack_streaming(defer_guards=True) == default per-op-guarded
    streaming, with the windowed DCN actually running (interpret mode,
    dense_threshold=32 so the 8x8 L1 maps take the Pallas route)."""
    from gpemsr_tpu.core.config import GPEMSRConfig
    from gpemsr_tpu.infer.sr import sr_stack_streaming
    from gpemsr_tpu.models.gpemsr import GPEMSR
    from gpemsr_tpu.ops import dcn_pallas
    from tests.test_models import tiny_prior

    cfg = GPEMSRConfig(nf=16, groups=4, front_RBs=1, back_RBs=1,
                       ref_fusion_feat_RBs=1, scale=16, prior=tiny_prior(16),
                       dcn_dense_threshold=32, dcn_window_radius=4)
    model = GPEMSR(cfg)
    stack = rng.uniform(0, 1, (6, 8, 8, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 5, 8, 8, 1), jnp.float32))
    old = dcn_pallas.INTERPRET
    dcn_pallas.INTERPRET = True
    try:
        a = sr_stack_streaming(model, params, stack)
        b = sr_stack_streaming(model, params, stack, defer_guards=True)
    finally:
        dcn_pallas.INTERPRET = old
    np.testing.assert_allclose(a.astype(int), b.astype(int), atol=1)
    assert np.mean(a != b) < 0.01
