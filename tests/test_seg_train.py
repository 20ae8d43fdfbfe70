"""Tests for MALIS weights, the seg training provider, seg train step, UNETR."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpemsr_tpu.data.seg_provider import SegAugmentConfig, SegTrainProvider
from gpemsr_tpu.seg import native
from gpemsr_tpu.seg.affinity import seg_to_aff


def test_malis_weights_two_objects():
    # 1-D-ish volume: two 2-voxel objects along x separated at the boundary
    seg = np.array([[[1, 1, 2, 2]]], np.uint32)         # [1,1,4]
    affs = np.ones((3, 1, 1, 4), np.float32)
    affs[2, 0, 0, 2] = 0.1                              # boundary edge
    pos = native.malis_weights(affs, seg, pos=True)
    neg = native.malis_weights(affs, seg, pos=False)
    # positive pass: each intra-object edge is maximin for its 1 pair
    assert pos[2, 0, 0, 1] == 1.0 and pos[2, 0, 0, 3] == 1.0
    assert pos[2, 0, 0, 2] == 0.0
    # negative pass: the low boundary edge is maximin for all 4 cross pairs
    assert neg[2, 0, 0, 2] == 4.0
    assert neg[2, 0, 0, 1] == 0.0


def test_malis_background_ignored_in_pos():
    seg = np.array([[[0, 0, 3, 3]]], np.uint32)
    affs = np.ones((3, 1, 1, 4), np.float32)
    pos = native.malis_weights(affs, seg, pos=True)
    # background pairs don't count in the positive pass
    assert pos[2, 0, 0, 1] == 0.0
    assert pos[2, 0, 0, 3] == 1.0


def test_seg_train_provider(rng):
    Z, Y, X = 20, 64, 64
    raw = rng.integers(0, 255, (Z, Y, X)).astype(np.uint8)
    labels = np.zeros((Z, Y, X), np.int64)
    labels[:, :, :30] = 1
    labels[:, :, 34:] = 2
    prov = SegTrainProvider(raw, labels, crop_size=(18, 32, 32))
    img, affs, w = prov.sample(0)
    assert img.shape == (18, 32, 32, 1)
    assert affs.shape == (3, 18, 32, 32)
    assert w.shape == affs.shape
    assert 0.0 <= img.min() and img.max() <= 1.0
    # determinism per seed
    img2, _, _ = prov.sample(0)
    np.testing.assert_array_equal(img, img2)
    imgs, affs_b, ws = prov.batch(2, seed=1)
    assert imgs.shape == (2, 18, 32, 32, 1)


def test_seg_train_step_learns(rng):
    from gpemsr_tpu.models.seg.superhuman import UNetSuperhuman
    from gpemsr_tpu.train.seg import init_seg_state

    model = UNetSuperhuman(filters=(4, 6, 8, 10, 12))
    sample = jnp.zeros((1, 18, 32, 32, 1), jnp.float32)
    state, batch_stats, step = init_seg_state(jax.random.PRNGKey(0), model,
                                              sample, lr=1e-3)
    raw = rng.integers(0, 255, (20, 64, 64)).astype(np.uint8)
    labels = np.zeros((20, 64, 64), np.int64)
    labels[:, :, :30] = 1
    labels[:, :, 34:] = 2
    prov = SegTrainProvider(raw, labels, crop_size=(18, 32, 32),
                            aug=SegAugmentConfig(if_elastic_aug=False))
    imgs, affs, w = prov.batch(1, seed=0)
    state, batch_stats, m0 = step(state, batch_stats,
                                  jnp.asarray(imgs), jnp.asarray(affs),
                                  jnp.asarray(w))
    for _ in range(4):
        state, batch_stats, m = step(state, batch_stats,
                                     jnp.asarray(imgs), jnp.asarray(affs),
                                     jnp.asarray(w))
    assert float(m["bce_loss"]) < float(m0["bce_loss"])


def test_unetr_shapes(rng):
    from gpemsr_tpu.models.seg.unetr import UNETR
    m = UNETR(embed_dim=32, depth=4, heads=4, patch=16, feat=4)
    x = jnp.asarray(rng.uniform(0, 1, (1, 4, 32, 32, 1)).astype(np.float32))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 4, 32, 32, 3)
    assert float(jnp.min(out)) >= 0 and float(jnp.max(out)) <= 1


def test_vit3d_shapes(rng):
    from gpemsr_tpu.models.seg.unetr import ViT3D
    m = ViT3D(embed_dim=32, depth=2, heads=4, patch=(2, 8, 8))
    x = jnp.asarray(rng.uniform(0, 1, (1, 4, 16, 16, 1)).astype(np.float32))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 2 * 2 * 2, 32)


def test_mutex_watershed_separates_objects(rng):
    from gpemsr_tpu.seg.mutex import gen_affs_mutex_3d, mutex_watershed, shift_func
    seg = np.zeros((3, 12, 12), np.uint32)
    seg[:, :, :5] = 1
    seg[:, :, 7:] = 2
    shifts = shift_func(12)
    affs = gen_affs_mutex_3d(seg, shifts, padding=False, background=False)
    assert affs.shape == (12, 3, 12, 12)
    out = mutex_watershed(affs, shifts, n_attractive=3)
    # left and right objects end in different clusters, uniform within
    assert np.unique(out[:, :, :4]).size == 1
    assert np.unique(out[:, :, 8:]).size == 1
    assert out[0, 0, 0] != out[0, 0, 11]


def test_shift_func_layout():
    from gpemsr_tpu.seg.mutex import shift_func
    s = shift_func(12)
    assert len(s) == 12
    assert s[:3] == [[-1, 0, 0], [0, -1, 0], [0, 0, -1]]


def test_monai_vit_shapes(rng):
    """MonaiViT (reference monai_vit.py): (out, hidden_states) in segmentation
    mode; cls-token + Tanh head in classification mode."""
    from gpemsr_tpu.models.seg.unetr import MonaiViT
    x = jnp.asarray(rng.uniform(0, 1, (1, 4, 16, 16, 1)).astype(np.float32))
    m = MonaiViT(embed_dim=32, depth=3, heads=4, patch=(2, 8, 8))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out, hidden = m.apply(params, x)
    assert out.shape == (1, 8, 32) and len(hidden) == 3
    assert all(h.shape == (1, 8, 32) for h in hidden)

    mc = MonaiViT(embed_dim=32, depth=2, heads=4, patch=(2, 8, 8),
                  classification=True, num_classes=5)
    params = jax.jit(mc.init)(jax.random.PRNGKey(0), x)
    out, hidden = mc.apply(params, x)
    assert out.shape == (1, 5)
    assert float(jnp.max(jnp.abs(out))) <= 1.0      # Tanh post-activation
    assert hidden[0].shape == (1, 9, 32)            # cls token prepended


def test_superhuman_variants(rng):
    """The reference's UNet_PNI_{embedding,embedding_deep,mask} surfaces as
    options (model_superhuman.py:173,335,495)."""
    from gpemsr_tpu.models.seg.superhuman import UNetSuperhuman
    x = jnp.asarray(rng.uniform(0, 1, (1, 4, 32, 32, 1)).astype(np.float32))

    emb = UNetSuperhuman(filters=(4, 6, 8, 10, 12), embedding_head=16)
    p = jax.jit(emb.init)(jax.random.PRNGKey(0), x)
    out = emb.apply(p, x)
    assert out.shape == (1, 4, 32, 32, 16)
    assert float(jnp.min(out)) < 0           # no sigmoid on the embedding

    deep = UNetSuperhuman(filters=(4, 6, 8, 10, 12), embedding_head=16,
                          deep_supervision=True)
    p = jax.jit(deep.init)(jax.random.PRNGKey(0), x)
    outs = deep.apply(p, x)
    assert len(outs) == 5                      # (out1..out4, out)
    assert outs[0].shape == (1, 4, 2, 2, 16)   # center: 1/16 spatial
    assert outs[-1].shape == (1, 4, 32, 32, 16)

    mask = UNetSuperhuman(filters=(4, 6, 8, 10, 12), return_embedding=True)
    p = jax.jit(mask.init)(jax.random.PRNGKey(0), x)
    embed_out, out = mask.apply(p, x)
    assert embed_out.shape == (1, 4, 32, 32, 4) and out.shape == (1, 4, 32, 32, 3)
    assert float(jnp.min(out)) >= 0 and float(jnp.max(out)) <= 1


def test_seg_train_step_valid_conv_crop(rng):
    """Valid-conv nets (MALA): apply returns a bare array (no batch stats)
    and the output is smaller than the crop — the seg step must center-crop
    targets to the prediction window (the bug that crashed MALA training)."""
    from flax import linen as nn
    from gpemsr_tpu.train.seg import init_seg_state

    class ValidNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(8, (3, 3, 3), padding="VALID", name="c1")(x)
            h = jax.nn.relu(h)
            h = nn.Conv(3, (3, 3, 3), padding="VALID", name="c2")(h)
            return jax.nn.sigmoid(h)

    model = ValidNet()
    sample = jnp.zeros((1, 12, 24, 24, 1), jnp.float32)
    state, batch_stats, step = init_seg_state(jax.random.PRNGKey(0), model,
                                              sample, lr=1e-2)
    assert batch_stats is None
    raw = rng.integers(0, 255, (16, 32, 32)).astype(np.uint8)
    labels = np.zeros((16, 32, 32), np.int64)
    labels[:, :, :14] = 1
    labels[:, :, 18:] = 2
    prov = SegTrainProvider(raw, labels, crop_size=(12, 24, 24),
                            aug=SegAugmentConfig(if_elastic_aug=False))
    imgs, affs, w = prov.batch(1, seed=0)
    assert affs.shape == (1, 3, 12, 24, 24)      # full-crop target
    state, batch_stats, m0 = step(state, batch_stats, jnp.asarray(imgs),
                                  jnp.asarray(affs), jnp.asarray(w))
    for _ in range(5):
        state, batch_stats, m = step(state, batch_stats, jnp.asarray(imgs),
                                     jnp.asarray(affs), jnp.asarray(w))
    assert np.isfinite(m["bce_loss"]) and m["bce_loss"] < m0["bce_loss"]


def test_se_layers_shapes_and_gating(rng):
    """SE family (reference residual.py:46-151 / squeeze_excite.py — dead
    code there, implemented for inventory completeness): shapes preserved,
    outputs are a bounded gate of the input."""
    from gpemsr_tpu.models.seg.se import (
        ResBlockSEAnisoDilation, SELayer, SELayerCS)

    x = jnp.asarray(rng.uniform(-1, 1, (1, 4, 16, 16, 8)).astype(np.float32))
    se = SELayer(channel=8)
    v = se.init(jax.random.PRNGKey(0), x)
    y = se.apply(v, x)
    assert y.shape == x.shape
    # channel gate is sigmoid-bounded: |y| <= |x| elementwise
    assert np.all(np.abs(np.asarray(y)) <= np.abs(np.asarray(x)) + 1e-6)

    secs = SELayerCS(channel=8)
    v = secs.init(jax.random.PRNGKey(0), x)
    y = secs.apply(v, x)
    assert y.shape == x.shape
    # channel+spatial gates sum: |y| <= 2|x|
    assert np.all(np.abs(np.asarray(y)) <= 2 * np.abs(np.asarray(x)) + 1e-6)

    blk = ResBlockSEAnisoDilation(out_planes=8)
    v = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()

    # train-mode BN updates batch_stats
    y, mut = blk.apply(v, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mut


def test_pad_to_crop_reflect(rng):
    """Volumes smaller than the training crop are reflect-padded (MALA's
    53-z valid-conv crop vs the 40-z synthetic train volume; reference
    provider_valid.py:154-160 applies the same reflect boundary)."""
    from train_seg import pad_to_crop

    raw = rng.integers(0, 255, (40, 64, 48)).astype(np.uint8)
    lab = rng.integers(1, 9, (40, 64, 48)).astype(np.uint32)
    r2, l2 = pad_to_crop(raw, lab, (53, 60, 64))
    assert r2.shape == (53, 64, 64) and l2.shape == (53, 64, 64)
    # reflect semantics in z: slice Z+k mirrors slice Z-2-k
    np.testing.assert_array_equal(r2[40, :, :48], raw[38])
    np.testing.assert_array_equal(l2[52, :, :48], lab[26])
    # untouched dims and the original contents are preserved
    np.testing.assert_array_equal(r2[:40, :, :48], raw)
    # no-op when the volume already covers the crop
    r3, l3 = pad_to_crop(raw, lab, (18, 60, 40))
    assert r3.shape == raw.shape and r3 is raw and l3 is lab
