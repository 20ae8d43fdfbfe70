"""Weight-conversion golden tests.

Builds torch oracle modules with the *reference checkpoint key layout*
(state_dict names like `input_layer.0.weight`, `feat_extract.N.block.0.weight`),
randomly initialises them, converts via gpemsr_tpu.models.convert, and checks
our flax modules reproduce the torch forward bit-closely."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gpemsr_tpu.core.config import (
    DecoderConfig, DiscriminatorConfig, EncoderConfig, IndexerConfig,
)
from gpemsr_tpu.models import convert as cv


# --- torch oracle building blocks (reference key layout) -------------------

def t_norm(c):
    return nn.GroupNorm(min(32, c), c, eps=1e-6, affine=True)


class TResBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(cin, cout, 3, 1, 1), t_norm(cout), nn.ReLU(),
            nn.Conv2d(cout, cout, 3, 1, 1), t_norm(cout), nn.ReLU())
        if cin != cout:
            self.channel_up = nn.Conv2d(cin, cout, 1, 1, 0)

    def forward(self, x):
        skip = self.channel_up(x) if hasattr(self, "channel_up") else x
        return skip + self.block(x)


class TDown(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.downblock = nn.Conv2d(cin, cout, 3, 2, 1)

    def forward(self, x):
        return self.downblock(x)


class TUp(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.upblock = nn.ConvTranspose2d(cin, cout, 3, 2, 1, 1)

    def forward(self, x):
        return self.upblock(x)


class TNonLocal(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.gn = t_norm(c)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        h = self.gn(x)
        b, c, hh, ww = x.shape
        q = self.q(h).reshape(b, c, -1).permute(0, 2, 1)
        k = self.k(h).reshape(b, c, -1)
        v = self.v(h).reshape(b, c, -1)
        attn = torch.softmax(torch.bmm(q, k) * c ** -0.5, dim=2).permute(0, 2, 1)
        out = torch.bmm(v, attn).reshape(b, c, hh, ww)
        return x + self.proj_out(out)


class TEncoder(nn.Module):
    def __init__(self, cfg: EncoderConfig):
        super().__init__()
        ch = list(cfg.channel_list)
        self.input_layer = nn.Sequential(nn.Conv2d(cfg.im_channel, ch[0], 3, 1, 1),
                                         nn.ReLU())
        layers = []
        for i in range(len(ch) - 1):
            for _ in range(cfg.num_resblock_per_scale):
                layers.append(TResBlock(ch[i], ch[i]))
            layers.append(TDown(ch[i], ch[i + 1]))
        if cfg.use_non_local:
            layers.append(TNonLocal(ch[-1]))
        self.feat_extract = nn.Sequential(*layers)
        out_layers = [TResBlock(ch[-1], ch[-1]) for _ in range(cfg.num_output_resblck)]
        out_layers.append(nn.Conv2d(ch[-1], cfg.latent_dim, 1))
        self.output_layer = nn.Sequential(*out_layers)

    def forward(self, x):
        return self.output_layer(self.feat_extract(self.input_layer(x)))


class TDecoder(nn.Module):
    def __init__(self, cfg: DecoderConfig):
        super().__init__()
        ch = list(cfg.channel_list)
        in_layers = [nn.Conv2d(cfg.latent_dim, ch[0], 1)]
        in_layers += [TResBlock(ch[0], ch[0]) for _ in range(cfg.num_input_resblck)]
        self.input_layer = nn.Sequential(*in_layers)
        layers = []
        if cfg.use_non_local:
            layers.append(TNonLocal(ch[0]))
        for i in range(len(ch) - 1):
            for _ in range(cfg.num_resblock_per_scale):
                layers.append(TResBlock(ch[i], ch[i]))
            layers.append(TUp(ch[i], ch[i + 1]))
        self.feat_extract = nn.Sequential(*layers)
        self.output_layer = nn.Conv2d(ch[-1], cfg.im_channel, 3, 1, 1)

    def forward(self, x, multi_scale=False):
        x = self.input_layer(x)
        if not multi_scale:
            return self.output_layer(self.feat_extract(x))
        feats = []
        nres = 1  # num_resblock_per_scale in tests
        for i, m in enumerate(self.feat_extract):
            x = m(x)
            if i > 0 and (i - nres) % (nres + 1) == 0:
                feats.append(x)
        feats.append(self.output_layer(x))
        return feats


ENC_CFG = EncoderConfig(channel_list=(8, 8, 16, 16, 32), latent_dim=32,
                        num_output_resblck=1)
DEC_CFG = DecoderConfig(channel_list=(32, 16, 16, 8, 8), latent_dim=32,
                        num_input_resblck=1)


def test_encoder_conversion(rng):
    from gpemsr_tpu.models.prior import Encoder
    torch.manual_seed(0)
    tm = TEncoder(ENC_CFG).eval()
    params = {"params": cv.convert_encoder(tm.state_dict(), ENC_CFG)}
    x = rng.standard_normal((1, 32, 32, 1), dtype=np.float32)
    ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    out = Encoder(ENC_CFG).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-4)


def test_decoder_conversion_multiscale(rng):
    from gpemsr_tpu.models.prior import Decoder
    torch.manual_seed(1)
    tm = TDecoder(DEC_CFG).eval()
    params = {"params": cv.convert_decoder(tm.state_dict(), DEC_CFG)}
    z = rng.standard_normal((1, 4, 4, 32), dtype=np.float32)
    tz = torch.from_numpy(z.transpose(0, 3, 1, 2))
    ref = tm(tz).detach().numpy()
    out = Decoder(DEC_CFG).apply(params, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-4)
    # multi-scale feature bank parity (decoder.py:40-57 collection rule)
    refs = tm(tz, multi_scale=True)
    outs = Decoder(DEC_CFG).apply(params, jnp.asarray(z), multi_scale=True)
    assert len(refs) == len(outs) == 5
    for r, o in zip(refs, outs):
        np.testing.assert_allclose(np.asarray(o).transpose(0, 3, 1, 2),
                                   r.detach().numpy(), atol=2e-4)


class TIndexer(nn.Module):
    def __init__(self, cfg: IndexerConfig, scale):
        super().__init__()
        ch = list(cfg.channel_list)
        self.input_layer = nn.Sequential(nn.Conv2d(cfg.im_channel, ch[0], 3, 1, 1),
                                         nn.ReLU())
        layers = []
        for i in range(len(ch) - 1):
            for _ in range(cfg.num_resblock_per_scale - 1):
                layers.append(TResBlock(ch[i], ch[i]))
            if scale == 8 and i == len(ch) - 2:
                layers.append(TDown(ch[i], ch[i + 1]))
            else:
                layers.append(TResBlock(ch[i], ch[i + 1]))
        if cfg.use_non_local:
            layers.append(TNonLocal(ch[-1]))
        self.feat_extract = nn.Sequential(*layers)
        out_layers = [TResBlock(ch[-1], ch[-1]) for _ in range(cfg.num_output_resblck)]
        out_layers.append(nn.Conv2d(ch[-1], cfg.latent_dim, 1))
        self.output_layer = nn.Sequential(*out_layers)
        self.embedding = nn.Linear(cfg.latent_dim, cfg.num_classes)

    def forward(self, x):
        feat = self.output_layer(self.feat_extract(self.input_layer(x)))
        return self.embedding(feat.permute(0, 2, 3, 1))


IDX_CFG = IndexerConfig(channel_list=(8, 8, 16, 16, 32), latent_dim=32,
                        num_resblock_per_scale=2, num_output_resblck=1,
                        num_classes=64)


@pytest.mark.parametrize("scale", [16, 8])
def test_indexer_conversion(rng, scale):
    from gpemsr_tpu.models.prior import Indexer
    torch.manual_seed(2)
    tm = TIndexer(IDX_CFG, scale).eval()
    params = {"params": cv.convert_indexer(tm.state_dict(), IDX_CFG, scale)}
    x = rng.standard_normal((1, 16, 16, 1), dtype=np.float32)
    ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    out = Indexer(IDX_CFG, scale=scale).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4)


class TDiscriminator(nn.Module):
    def __init__(self, cfg: DiscriminatorConfig):
        super().__init__()
        nfl = cfg.num_filters_last
        layers = [nn.Conv2d(cfg.im_channel, nfl, 4, 2, 0), nn.LeakyReLU(0.2)]
        mult = 1
        for i in range(1, cfg.n_layers + 1):
            last = mult
            mult = min(2 ** i, 8)
            layers += [nn.Conv2d(nfl * last, nfl * mult, 4,
                                 2 if i < cfg.n_layers else 1, 0, bias=False),
                       nn.InstanceNorm2d(nfl * mult), nn.LeakyReLU(0.2)]
        layers.append(nn.Conv2d(nfl * mult, 1, 4, 1, 0))
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


def test_discriminator_conversion(rng):
    from gpemsr_tpu.models.prior import Discriminator
    cfg = DiscriminatorConfig(num_filters_last=8, n_layers=3)
    torch.manual_seed(3)
    tm = TDiscriminator(cfg).eval()
    params = {"params": cv.convert_discriminator(tm.state_dict(), cfg)}
    x = rng.standard_normal((2, 128, 128, 1), dtype=np.float32)
    ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    out = Discriminator(cfg).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-4)


def test_convtranspose_matches_torch(rng):
    from gpemsr_tpu.models.layers import ConvTranspose2dTorch
    torch.manual_seed(4)
    tm = nn.ConvTranspose2d(6, 10, 3, 2, 1, 1)
    x = rng.standard_normal((2, 5, 7, 6), dtype=np.float32)
    ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    params = {"params": {"kernel": cv.convT_w(tm.weight),
                         "bias": cv.vec(tm.bias)}}
    out = ConvTranspose2dTorch(10).apply(params, jnp.asarray(x))
    assert out.shape == (2, 10, 14, 10)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-5)


def test_vgg_conversion(rng):
    """Random-weight torchvision-layout VGG19 slice vs our VGG19Features."""
    from gpemsr_tpu.models.vgg import VGG19Features
    torch.manual_seed(5)
    feats = nn.Sequential(
        nn.Conv2d(3, 64, 3, 1, 1), nn.ReLU(), nn.Conv2d(64, 64, 3, 1, 1),
        nn.ReLU(), nn.MaxPool2d(2),
        nn.Conv2d(64, 128, 3, 1, 1), nn.ReLU(), nn.Conv2d(128, 128, 3, 1, 1),
        nn.ReLU(), nn.MaxPool2d(2),
        nn.Conv2d(128, 256, 3, 1, 1), nn.ReLU(), nn.Conv2d(256, 256, 3, 1, 1),
        nn.ReLU(), nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(2),
    ).eval()
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    params = {"params": cv.convert_vgg19(sd, max_layer="relu3_4")}
    x = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    r12 = feats[:4](tx)
    r34 = feats[:-1](tx)     # relu3_4 sits before the trailing pool
    out = VGG19Features(max_layer="relu3_4").apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out["relu1_2"]).transpose(0, 3, 1, 2),
        r12.detach().numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["relu3_4"]).transpose(0, 3, 1, 2),
        r34.detach().numpy(), atol=2e-4)


def test_spynet_conversion_level(rng):
    """Single BasicModule conversion parity."""
    from gpemsr_tpu.models.spynet import BasicModule
    torch.manual_seed(6)
    tm = nn.Sequential(
        nn.Conv2d(8, 32, 7, 1, 3), nn.ReLU(), nn.Conv2d(32, 64, 7, 1, 3),
        nn.ReLU(), nn.Conv2d(64, 32, 7, 1, 3), nn.ReLU(),
        nn.Conv2d(32, 16, 7, 1, 3), nn.ReLU(), nn.Conv2d(16, 2, 7, 1, 3),
    ).eval()
    sd = {f"basic_module.0.basic_module.{k}": v for k, v in tm.state_dict().items()}
    tree = cv.convert_spynet(sd, levels=1)
    params = {"params": tree["basic_module0"]}
    x = rng.standard_normal((1, 16, 16, 8), dtype=np.float32)
    ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    out = BasicModule().apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-4)


def test_spynet_full_pyramid_conversion(rng):
    """6-level coarse-to-fine flow vs a torch oracle with the basicsr
    semantics (avg-pool pyramid, x2-upsampled flow, border-padded warp)."""
    from gpemsr_tpu.models.spynet import SpyNet

    torch.manual_seed(7)
    levels = 6

    def make_module():
        return nn.Sequential(
            nn.Conv2d(8, 32, 7, 1, 3), nn.ReLU(), nn.Conv2d(32, 64, 7, 1, 3),
            nn.ReLU(), nn.Conv2d(64, 32, 7, 1, 3), nn.ReLU(),
            nn.Conv2d(32, 16, 7, 1, 3), nn.ReLU(), nn.Conv2d(16, 2, 7, 1, 3))

    mods = nn.ModuleList([make_module() for _ in range(levels)]).eval()

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def torch_flow(ref, supp):
        ref = (ref - mean) / std
        supp = (supp - mean) / std
        refs, supps = [ref], [supp]
        for _ in range(levels - 1):
            refs.insert(0, F.avg_pool2d(refs[0], 2))
            supps.insert(0, F.avg_pool2d(supps[0], 2))
        n, _, h, w = refs[0].shape
        flow = torch.zeros(n, 2, h, w)
        for lv in range(levels):
            if lv == 0:
                up = flow
            else:
                up = F.interpolate(flow, scale_factor=2, mode="bilinear",
                                   align_corners=True) * 2.0
            _, _, hh, ww = supps[lv].shape
            gy, gx = torch.meshgrid(torch.arange(hh), torch.arange(ww),
                                    indexing="ij")
            grid = torch.stack((gx, gy), 2).float()[None]
            v = grid + up.permute(0, 2, 3, 1)
            vx = 2.0 * v[..., 0] / max(ww - 1, 1) - 1.0
            vy = 2.0 * v[..., 1] / max(hh - 1, 1) - 1.0
            warped = F.grid_sample(supps[lv], torch.stack((vx, vy), 3),
                                   mode="bilinear", padding_mode="border",
                                   align_corners=True)
            flow = up + mods[lv](torch.cat([refs[lv], warped, up], 1))
        return flow

    sd = {}
    for lv, m in enumerate(mods):
        for k, v in m.state_dict().items():
            sd[f"basic_module.{lv}.basic_module.{k}"] = v
    params = {"params": cv.convert_spynet(sd)}

    a = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_flow = torch_flow(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                              torch.from_numpy(b.transpose(0, 3, 1, 2)))
    out = SpyNet().apply(params, jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref_flow.numpy(), atol=5e-4)
