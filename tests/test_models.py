"""Shape/smoke tests for the model zoo on tiny configs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpemsr_tpu.core.config import (
    CodebookConfig, DecoderConfig, DiscriminatorConfig, EncoderConfig,
    GPEMSRConfig, IndexerConfig, PriorConfig,
)


def tiny_prior(scale=16):
    return PriorConfig(
        encoder=EncoderConfig(channel_list=(8, 8, 16, 16, 32), latent_dim=32,
                              num_output_resblck=1),
        decoder=DecoderConfig(channel_list=(32, 16, 16, 8, 8), latent_dim=32,
                              num_input_resblck=1),
        codebook=CodebookConfig(num_codebook_vectors=64, latent_dim=32),
        indexer=IndexerConfig(channel_list=(8, 8, 16, 16, 32), latent_dim=32,
                              num_output_resblck=1, num_classes=64),
        scale=scale,
    )


def test_vqgan_generator_shapes(rng):
    from gpemsr_tpu.models.prior import VQGANGenerator
    cfg = tiny_prior()
    m = VQGANGenerator(cfg)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 1), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    dec, idx, q_loss = m.apply(params, x)
    assert dec.shape == (1, 64, 64, 1)
    assert idx.shape == (1 * 4 * 4,)       # 16x reduction
    assert q_loss.shape == ()


def test_discriminator_shapes(rng):
    from gpemsr_tpu.models.prior import Discriminator
    m = Discriminator(DiscriminatorConfig())
    # VALID 4x4 conv stack needs >= 70px inputs (see Discriminator guard)
    x = jnp.asarray(rng.standard_normal((1, 96, 96, 1), dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape[0] == 1 and out.shape[-1] == 1


@pytest.mark.parametrize("scale", [16, 8])
def test_lrgenerator_shapes(rng, scale):
    from gpemsr_tpu.models.prior import LRGenerator
    cfg = tiny_prior(scale)
    m = LRGenerator(cfg)
    lr_size = 8 if scale == 16 else 16      # latent grid is 8x8 either way
    lr = jnp.asarray(rng.standard_normal((1, lr_size, lr_size, 1), np.float32))
    gt = jnp.asarray(rng.standard_normal((1, lr_size * scale, lr_size * scale, 1),
                                         np.float32))
    params = m.init(jax.random.PRNGKey(0), lr, gt, method=m.init_all)
    logits, gt_idx = m.apply(params, lr, gt)
    assert logits.shape == (64, 64)         # [B*8*8, V]
    assert gt_idx.shape == (64,)
    ref = m.apply(params, lr, method=m.output_ref)
    assert ref.shape == (1, lr_size * scale, lr_size * scale, 1)
    bank = m.apply(params, lr, method=m.ref_extract)
    assert len(bank) == 5
    # feature bank: [D@1x, .., @8x, img@16x of latent grid]
    assert bank[0].shape[1] == 8 and bank[3].shape[1] == 64
    assert bank[4].shape == (1, 128, 128, 1)


def test_spynet_shapes(rng):
    from gpemsr_tpu.models.spynet import SpyNet
    m = SpyNet()
    a = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), a, b)
    flow = m.apply(params, a, b)
    assert flow.shape == (2, 32, 32, 2)


def test_vgg_shapes(rng):
    from gpemsr_tpu.models.vgg import VGG19Features
    m = VGG19Features(max_layer="relu3_4")
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["relu1_2"].shape == (1, 32, 32, 64)
    assert out["relu2_2"].shape == (1, 16, 16, 128)
    assert out["relu3_4"].shape == (1, 8, 8, 256)


def test_gpemsr_forward(rng):
    from gpemsr_tpu.models.gpemsr import GPEMSR
    cfg = GPEMSRConfig(nf=16, groups=4, front_RBs=1, back_RBs=1,
                       ref_fusion_feat_RBs=1, scale=16, prior=tiny_prior(16))
    m = GPEMSR(cfg)
    x = jnp.asarray(rng.uniform(0, 1, (1, 5, 8, 8, 1)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    sr, ref = m.apply(params, x)
    assert sr.shape == (1, 128, 128, 1)
    assert ref.shape == (1, 5, 128, 128, 1)


def test_superhuman_shapes(rng):
    from gpemsr_tpu.models.seg.superhuman import UNetSuperhuman
    m = UNetSuperhuman(filters=(4, 6, 8, 10, 12))
    x = jnp.asarray(rng.uniform(0, 1, (1, 18, 32, 32, 1)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 18, 32, 32, 3)
    assert float(jnp.min(out)) >= 0 and float(jnp.max(out)) <= 1


def test_mala_shapes(rng):
    from gpemsr_tpu.models.seg.mala import UNetMALA
    m = UNetMALA()
    x = jnp.asarray(rng.uniform(0, 1, (1, 53, 106, 106, 1)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    # valid convs eat 14 z / 106 xy: 106-pad*2 = -106 -> out 25 z
    assert out.shape[1] == 25 and out.shape[-1] == 3


def test_gpemsr_forward_x8(rng):
    from gpemsr_tpu.models.gpemsr import GPEMSR
    cfg = GPEMSRConfig(nf=16, groups=4, front_RBs=1, back_RBs=1,
                       ref_fusion_feat_RBs=1, scale=8, prior=tiny_prior(8))
    m = GPEMSR(cfg)
    x = jnp.asarray(rng.uniform(0, 1, (1, 5, 8, 8, 1)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    sr, ref = m.apply(params, x)
    assert sr.shape == (1, 64, 64, 1)
    assert ref.shape == (1, 5, 64, 64, 1)


def test_gpemsr_vggmask_kernel_route(rng):
    """Full forward with the fused VGG-mask Pallas kernel (interpret mode)
    == the unfused XLA path, including the in-model parameter plumbing."""
    from gpemsr_tpu.models.gpemsr import GPEMSR
    from gpemsr_tpu.ops import vggmask_pallas

    cfg = GPEMSRConfig(nf=16, groups=4, front_RBs=1, back_RBs=1,
                       ref_fusion_feat_RBs=1, scale=16, prior=tiny_prior(16))
    m = GPEMSR(cfg)
    x = jnp.asarray(rng.uniform(0, 1, (1, 5, 8, 8, 1)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    sr_ref = m.apply(params, x)[0]

    old = vggmask_pallas.INTERPRET
    vggmask_pallas.INTERPRET = True
    try:
        sr_k = m.apply(params, x)[0]
    finally:
        vggmask_pallas.INTERPRET = old
    np.testing.assert_allclose(np.asarray(sr_k), np.asarray(sr_ref),
                               atol=2e-4)
