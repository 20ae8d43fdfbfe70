"""Differential tests against the ACTUAL reference source.

Unlike test_convert.py / test_ops.py (which compare against torch oracles
transcribed from the reference), these tests `sys.path`-import the real
modules under /root/reference/GPEMSR-CREMI/GPEMSR — pure torch/numpy code
that imports cleanly in this env — build them with random weights, convert
via gpemsr_tpu.models.convert, and assert our flax/jax implementations
reproduce the reference forward. A transcription can share a misreading
with the port; these cannot.

Covered (everything importable without basicsr/CUDA/skimage):
  model/encoder.py, decoder.py (incl. multi_scale_feat_calculate),
  codebook.py (STE forward + inference_lr), indexer.py (16 and 8),
  discriminator.py, contextual.py (CX cosine/L1/L2 + CoBi),
  lr_scheduler.py (cosine + multistep restart), data/util.py
  (imresize_np, index_generation), and provider_valid.get_weight
  (executed from its AST — the module itself imports skimage).
POD/DCN/SpyNet need basicsr + compiled CUDA and stay covered by the
transcribed oracles in test_convert_gpemsr.py / test_full_parity*.py.
"""

import ast
import dataclasses
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gpemsr_tpu.core.config import (
    CodebookConfig, DecoderConfig, DiscriminatorConfig, EncoderConfig,
    IndexerConfig,
)
from gpemsr_tpu.models import convert as cv

REF = "/root/reference/GPEMSR-CREMI/GPEMSR"


@pytest.fixture(scope="module")
def ref():
    """Import the reference's `model` and `data` packages."""
    sys.path.insert(0, REF)
    try:
        import data.util as r_util
        import model.codebook as r_codebook
        import model.contextual as r_contextual
        import model.decoder as r_decoder
        import model.discriminator as r_discriminator
        import model.encoder as r_encoder
        import model.indexer as r_indexer
        import model.lr_scheduler as r_sched
        yield {
            "encoder": r_encoder, "decoder": r_decoder,
            "codebook": r_codebook, "indexer": r_indexer,
            "discriminator": r_discriminator, "contextual": r_contextual,
            "sched": r_sched, "util": r_util,
        }
    finally:
        sys.path.remove(REF)


def nchw(x_nhwc):
    return np.asarray(x_nhwc).transpose(0, 3, 1, 2)


# the reference's Normalize is a fixed GroupNorm(num_groups=32, ...)
# (model/blocks.py:5-6), so every channel count must be a multiple of 32
ENC_CFG = EncoderConfig(channel_list=(32, 32, 64), latent_dim=64,
                        num_resblock_per_scale=1, num_output_resblck=2,
                        use_non_local=True)
DEC_CFG = DecoderConfig(channel_list=(64, 32, 32), latent_dim=64,
                        num_resblock_per_scale=1, num_input_resblck=2,
                        use_non_local=True)
# Indexer8 only has its DownBlock when len(channel_list) == 5
# (indexer.py:79 `if i == 3`), so the indexer list keeps full length
IDX_CFG = IndexerConfig(channel_list=(32, 32, 32, 32, 64), latent_dim=64,
                        num_resblock_per_scale=2, num_output_resblck=2,
                        use_non_local=True, num_classes=1024)


def test_encoder_direct(ref, rng):
    from gpemsr_tpu.models.prior import Encoder
    torch.manual_seed(0)
    tm = ref["encoder"].Encoder(dataclasses.asdict(ENC_CFG)).eval()
    params = {"params": cv.convert_encoder(tm.state_dict(), ENC_CFG)}
    x = rng.standard_normal((2, 32, 32, 1)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(nchw(x))).numpy()
    got = Encoder(ENC_CFG).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(nchw(got), want, atol=2e-4)


def test_decoder_direct_forward_and_multiscale(ref, rng):
    from gpemsr_tpu.models.prior import Decoder
    torch.manual_seed(1)
    tm = ref["decoder"].Decoder(dataclasses.asdict(DEC_CFG)).eval()
    params = {"params": cv.convert_decoder(tm.state_dict(), DEC_CFG)}
    z = rng.standard_normal((1, 4, 4, 64)).astype(np.float32)
    tz = torch.from_numpy(nchw(z))
    with torch.no_grad():
        want = tm(tz).numpy()
        want_ms = [t.numpy() for t in tm.multi_scale_feat_calculate(tz)]
    got = Decoder(DEC_CFG).apply(params, jnp.asarray(z))
    np.testing.assert_allclose(nchw(got), want, atol=2e-4)
    got_ms = Decoder(DEC_CFG).apply(params, jnp.asarray(z), multi_scale=True)
    assert len(got_ms) == len(want_ms)
    for g, w in zip(got_ms, want_ms):
        np.testing.assert_allclose(nchw(g), w, atol=2e-4)


def test_codebook_direct_ste_and_inference_lr(ref, rng):
    from gpemsr_tpu.models.prior import Codebook
    torch.manual_seed(2)
    ccfg = CodebookConfig(num_codebook_vectors=64, latent_dim=16, beta=1.0)
    tm = ref["codebook"].Codebook(dataclasses.asdict(ccfg)).eval()
    emb = tm.embedding.weight.detach().numpy()
    params = {"params": {"embedding": jnp.asarray(emb)}}
    z = rng.standard_normal((2, 4, 4, 16)).astype(np.float32)
    with torch.no_grad():
        zq_t, idx_t, loss_t = tm(torch.from_numpy(nchw(z)))
    model = Codebook(ccfg)
    zq, idx, loss = model.apply(params, jnp.asarray(z))
    np.testing.assert_array_equal(np.asarray(idx), idx_t.numpy())
    np.testing.assert_allclose(nchw(zq), zq_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(float(loss), float(loss_t), atol=1e-5)

    # inference_lr: reference hardcodes 1024 logits but indexes the V-row
    # embedding; keep logits within [0, V)
    logits = rng.standard_normal((2, 4, 4, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm.inference_lr(torch.from_numpy(logits)).numpy()
    got = model.apply(params, jnp.asarray(logits), method=Codebook.inference_lr)
    np.testing.assert_allclose(nchw(got), want, atol=1e-6)


@pytest.mark.parametrize("scale", [16, 8])
def test_indexer_direct(ref, rng, scale):
    from gpemsr_tpu.models.prior import Indexer
    torch.manual_seed(3)
    cls = ref["indexer"].Indexer16 if scale == 16 else ref["indexer"].Indexer8
    tm = cls(dataclasses.asdict(IDX_CFG)).eval()
    params = {"params": cv.convert_indexer(tm.state_dict(), IDX_CFG,
                                           scale=scale)}
    x = rng.standard_normal((1, 16, 16, 1)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(nchw(x))).numpy()   # [B, H, W, 1024]
    got = Indexer(IDX_CFG, scale=scale).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_discriminator_direct(ref, rng):
    from gpemsr_tpu.models.prior import Discriminator
    torch.manual_seed(4)
    dcfg = DiscriminatorConfig(im_channel=1, num_filters_last=8, n_layers=3)
    tm = ref["discriminator"].Discriminator(dataclasses.asdict(dcfg)).eval()
    params = {"params": cv.convert_discriminator(tm.state_dict(), dcfg)}
    # padding-0 convs shrink fast: 128 -> 63 -> 30 -> 14 -> 11 -> 8
    x = rng.standard_normal((2, 128, 128, 1)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(nchw(x))).numpy()
    got = Discriminator(dcfg).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(nchw(got), want, atol=2e-4)


@pytest.mark.parametrize("loss_type", ["cosine", "L1", "L2"])
def test_contextual_direct(ref, rng, loss_type):
    from gpemsr_tpu.ops.contextual import contextual_loss
    x = rng.standard_normal((2, 8, 6, 6)).astype(np.float32)
    y = rng.standard_normal((2, 8, 6, 6)).astype(np.float32)
    want, _ = ref["contextual"].contextual_loss(
        torch.from_numpy(x), torch.from_numpy(y), band_width=0.5,
        loss_type=loss_type)
    got = contextual_loss(jnp.asarray(x), jnp.asarray(y), band_width=0.5,
                          loss_type=loss_type)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("loss_type", ["cosine", "L2"])
def test_contextual_bilateral_direct(ref, rng, loss_type):
    from gpemsr_tpu.ops.contextual import contextual_bilateral_loss
    x = rng.standard_normal((2, 8, 6, 6)).astype(np.float32)
    y = rng.standard_normal((2, 8, 6, 6)).astype(np.float32)
    want, _ = ref["contextual"].contextual_bilateral_loss(
        torch.from_numpy(x), torch.from_numpy(y), weight_sp=0.1,
        band_width=0.5, loss_type=loss_type)
    got = contextual_bilateral_loss(jnp.asarray(x), jnp.asarray(y),
                                    weight_sp=0.1, band_width=0.5,
                                    loss_type=loss_type)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)


def test_cosine_scheduler_direct(ref):
    from gpemsr_tpu.train.schedules import cosine_annealing_restart
    base_lr, eta_min = 4e-4, 1e-7
    T_period = [40, 80, 120, 120, 120]
    restarts = [40, 120, 240, 360]
    weights = [1, 0.5, 1, 0.5]
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    tsched = ref["sched"].CosineAnnealingLR_Restart(
        opt, T_period, restarts=restarts, weights=weights, eta_min=eta_min)
    torch_lrs = []
    for _ in range(481):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        tsched.step()
    sched = cosine_annealing_restart(base_lr, T_period, restarts, weights,
                                     eta_min)
    ours = [float(sched(s)) for s in range(481)]
    # exact step-for-step match (tolerance only for recursive-formula
    # float error accumulation in the torch version)
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-4, atol=1e-9)


def test_multistep_scheduler_direct(ref):
    from gpemsr_tpu.train.schedules import multistep_restart
    base_lr, gamma = 2e-4, 0.5
    milestones = [10, 20, 40]
    restarts = [50]
    weights = [0.5]
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    tsched = ref["sched"].MultiStepLR_Restart(
        opt, milestones, restarts=restarts, weights=weights, gamma=gamma)
    torch_lrs = []
    for _ in range(81):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        tsched.step()
    sched = multistep_restart(base_lr, milestones, restarts, weights, gamma)
    ours = [float(sched(s)) for s in range(81)]
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-6, atol=1e-12)


@pytest.mark.parametrize("scale", [0.25, 0.5, 1 / 3])
def test_imresize_np_direct(ref, rng, scale):
    from gpemsr_tpu.data.resize import imresize_np
    img = rng.uniform(0, 1, (33, 29, 1)).astype(np.float32)
    want = np.asarray(ref["util"].imresize_np(img.astype(np.float64), scale))
    got = imresize_np(img, scale)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_index_generation_direct(ref):
    from gpemsr_tpu.data.windows import index_generation
    for padding in ("replicate", "reflection", "new_info", "circle"):
        for max_n in (5, 7, 18, 100):
            for crt_i in range(max_n):
                want = ref["util"].index_generation(crt_i, max_n, 5,
                                                    padding=padding)
                got = index_generation(crt_i, max_n, 5, padding=padding)
                assert got == want, (padding, max_n, crt_i, got, want)


def _load_ref_get_weight():
    """Execute Provider_valid.get_weight from the reference's AST (the module
    itself imports skimage, which isn't installed; the method body is pure
    numpy — inference_code/data/provider_valid.py:256-268)."""
    path = REF + "/inference_code/data/provider_valid.py"
    with open(path) as f:
        tree = ast.parse(f.read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "get_weight":
            mod = ast.Module(body=[node], type_ignores=[])
            ns = {"np": np}
            exec(compile(mod, path, "exec"), ns)  # noqa: S102 — ref source
            return ns["get_weight"]
    raise AssertionError("get_weight not found in provider_valid.py")


def test_provider_get_weight_direct():
    from gpemsr_tpu.infer.tiled3d import gaussian_weight
    ref_get_weight = _load_ref_get_weight()

    class S:
        pass

    s = S()
    s.num_z = 18
    s.out_size = (18, 56, 56)
    want = ref_get_weight(s, sigma=0.2, mu=0.0)
    got = gaussian_weight(s.out_size, sigma=0.2)
    np.testing.assert_allclose(got[None], want, rtol=1e-6, atol=1e-7)
