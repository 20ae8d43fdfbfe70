"""Full GPEMSR end-to-end parity: our flax model with weights converted from
a torch oracle assembled out of the component oracles (encoder/decoder/
indexer from test_convert, POD/ThreeDA/DCN from test_convert_gpemsr, the
6-level SpyNet pyramid from test_convert) wired with the reference's forward
dataflow (GPEMSR.py:323-456). This pins the remaining glue: prior fusion
levels, mask scales, center broadcasting, upsampler ordering, bilinear base."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gpemsr_tpu.core.config import GPEMSRConfig
from gpemsr_tpu.models import convert as cv
from tests.test_convert import TDecoder, TEncoder, TIndexer
from tests.test_convert_gpemsr import TPOD, TThreeDA
from tests.test_models import tiny_prior

NF = 16
G = 4


def t_lrelu(v):
    return F.leaky_relu(v, 0.1)


def t_up(v, s):
    return F.interpolate(v, scale_factor=s, mode="bilinear",
                         align_corners=False)


class TResNoBN(nn.Module):
    def __init__(s, nf):
        super().__init__()
        s.conv1 = nn.Conv2d(nf, nf, 3, 1, 1)
        s.conv2 = nn.Conv2d(nf, nf, 3, 1, 1)

    def forward(s, x):
        return x + s.conv2(F.relu(s.conv1(x)))


class TSpyNet(nn.Module):
    def __init__(s, levels=6):
        super().__init__()
        def mk():
            return nn.Sequential(
                nn.Conv2d(8, 32, 7, 1, 3), nn.ReLU(), nn.Conv2d(32, 64, 7, 1, 3),
                nn.ReLU(), nn.Conv2d(64, 32, 7, 1, 3), nn.ReLU(),
                nn.Conv2d(32, 16, 7, 1, 3), nn.ReLU(), nn.Conv2d(16, 2, 7, 1, 3))
        s.levels = levels
        s.basic_module = nn.ModuleList(
            [nn.Sequential(*[]) for _ in range(0)])
        s.mods = nn.ModuleList([mk() for _ in range(levels)])
        s.register_buffer("mean", torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1))
        s.register_buffer("std", torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1))

    def forward(s, ref, supp):
        # 1-channel input broadcasts against the 3-channel stats (the quirk
        # the reference inherits from feeding grayscale into basicsr SpyNet)
        ref = (ref - s.mean) / s.std
        supp = (supp - s.mean) / s.std
        refs, supps = [ref], [supp]
        for _ in range(s.levels - 1):
            refs.insert(0, F.avg_pool2d(refs[0], 2))
            supps.insert(0, F.avg_pool2d(supps[0], 2))
        n, _, h, w = refs[0].shape
        flow = torch.zeros(n, 2, h, w)
        for lv in range(s.levels):
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
            flow = up + s.mods[lv](torch.cat([refs[lv], warped, up], 1))
        return flow


class TGPEMSR(nn.Module):
    """Oracle with the reference's state_dict layout and forward dataflow."""

    def __init__(s, prior, nf=NF, groups=G, front_rbs=1, back_rbs=1,
                 fusion_rbs=1, nframes=5):
        super().__init__()
        s.nf, s.center, s.scale = nf, nframes // 2, 16
        s.conv_first = nn.Conv2d(1, nf, 3, 1, 1)
        s.feature_extraction = nn.Sequential(
            *[TResNoBN(nf) for _ in range(front_rbs)])
        # vgg slice1 (relu1_2 only)
        s.vgg_c1 = nn.Conv2d(3, 64, 3, 1, 1)
        s.vgg_c2 = nn.Conv2d(64, 64, 3, 1, 1)
        s.refmaskconv1 = nn.Conv2d(1, nf, 3, 1, 1)
        s.refmaskconv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        s.refmaskconv3 = nn.Conv2d(nf, 1, 3, 1, 1)
        s.reffea_L2_conv1 = nn.ConvTranspose2d(nf, nf, 3, 2, 1, 1)
        s.reffea_L3_conv1 = nn.ConvTranspose2d(nf, nf, 3, 2, 1, 1)
        s.reffea_L4_conv1 = nn.ConvTranspose2d(nf, nf, 3, 2, 1, 1)
        dch = list(prior.decoder.channel_list)
        s.reffusionconv1 = nn.Conv2d(nf + dch[3], nf, 3, 1, 1)
        s.fusion_fea_block1 = nn.Sequential(*[TResNoBN(nf)] * 0,
                                            *[TResNoBN(nf) for _ in range(fusion_rbs)])
        s.down_fea_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        s.reffusionconv2 = nn.Conv2d(2 * nf + dch[2], nf, 3, 1, 1)
        s.fusion_fea_block2 = nn.Sequential(*[TResNoBN(nf) for _ in range(fusion_rbs)])
        s.down_fea_conv2 = nn.Conv2d(2 * nf, 2 * nf, 3, 2, 1)
        s.reffusionconv3 = nn.Conv2d(3 * nf + dch[1], nf, 3, 1, 1)
        s.fusion_fea_block3 = nn.Sequential(*[TResNoBN(nf) for _ in range(fusion_rbs)])
        s.down_fea_conv3 = nn.Conv2d(3 * nf, 3 * nf, 3, 2, 1)
        s.reffusionconv4 = nn.Conv2d(4 * nf + dch[0], nf, 3, 1, 1)
        s.fusion_fea_block4 = nn.Sequential(*[TResNoBN(nf) for _ in range(fusion_rbs)])
        s.reduce_dim_conv = nn.Conv2d(5 * nf, nf, 1, 1, 0)
        # frozen prior
        s.indexer = TIndexer(prior.indexer, 16)
        s.decoder = TDecoder(prior.decoder)
        s.embedding = nn.Embedding(prior.codebook.num_codebook_vectors,
                                   prior.codebook.latent_dim)
        # alignment
        s.fea_L2_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        s.fea_L2_conv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        s.fea_L3_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        s.fea_L3_conv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        s.pod = TPOD(nf, groups)
        s.spynet = TSpyNet()
        s.tsa = TThreeDA(nf, nframes, nframes // 2)
        s.recon_trunk = nn.Sequential(*[TResNoBN(nf) for _ in range(back_rbs)])
        s.upconv1 = nn.Conv2d(nf, nf * 4, 3, 1, 1)
        s.upconv2 = nn.Conv2d(nf, 64 * 4, 3, 1, 1)
        s.upconv3 = nn.Conv2d(64, 64 * 4, 3, 1, 1)
        s.upconv4 = nn.Conv2d(64, 64 * 4, 3, 1, 1)
        s.HRconv = nn.Conv2d(64, 64, 3, 1, 1)
        s.conv_last = nn.Conv2d(64, 1, 3, 1, 1)

    def vgg12(s, x):
        return F.relu(s.vgg_c2(F.relu(s.vgg_c1(x))))

    def ref_extract(s, lr):
        logits = s.indexer(lr)                         # [B, H, W, V]
        idx = logits.argmax(-1)
        z_q = s.embedding(idx).permute(0, 3, 1, 2)
        return s.decoder(z_q, multi_scale=True)

    def forward(s, x):
        B, N, C, H, W = x.shape
        x_center = x[:, s.center]
        xf = x.reshape(-1, C, H, W)
        l1 = s.feature_extraction(t_lrelu(s.conv_first(xf)))

        # prior branch
        l2 = t_lrelu(s.reffea_L2_conv1(l1))
        l3 = t_lrelu(s.reffea_L3_conv1(l2))
        l4 = t_lrelu(s.reffea_L4_conv1(l3))
        rx16, rx8, rx4, rx2, rimg = s.ref_extract(xf)
        up_lr = t_up(xf, 16)
        fr = F.normalize(F.unfold(s.vgg12(rimg.expand(-1, 3, -1, -1)), 16,
                                  stride=16), dim=1)
        fl = F.normalize(F.unfold(s.vgg12(up_lr.expand(-1, 3, -1, -1)), 16,
                                  stride=16), dim=1)
        mask = (fr * fl).sum(1, keepdim=True).reshape(B * N, 1, H, W)
        mask = torch.sigmoid(s.refmaskconv3(t_lrelu(s.refmaskconv2(
            t_lrelu(s.refmaskconv1(mask))))))

        r2 = s.reffusionconv1(torch.cat((l4, rx2), 1))
        r2 = s.fusion_fea_block1(r2) * t_up(mask, 8)
        r2 = s.down_fea_conv1(r2)
        r4 = s.reffusionconv2(torch.cat((l3, rx4, r2), 1))
        r4 = s.fusion_fea_block2(r4) * t_up(mask, 4)
        r4 = s.down_fea_conv2(torch.cat((r4, r2), 1))
        r8 = s.reffusionconv3(torch.cat((l2, rx8, r4), 1))
        r8 = s.fusion_fea_block3(r8) * t_up(mask, 2)
        r8 = s.down_fea_conv3(torch.cat((r8, r4), 1))
        r16 = s.reffusionconv4(torch.cat((l1, rx16, r8), 1))
        r16 = s.fusion_fea_block4(r16) * mask
        l1 = s.reduce_dim_conv(torch.cat((r16, r8, l1), 1))

        # alignment
        a2 = t_lrelu(s.fea_L2_conv2(t_lrelu(s.fea_L2_conv1(l1))))
        a3 = t_lrelu(s.fea_L3_conv2(t_lrelu(s.fea_L3_conv1(a2))))
        l1v = l1.view(B, N, -1, H, W)
        a2v = a2.view(B, N, -1, H // 2, W // 2)
        a3v = a3.view(B, N, -1, H // 4, W // 4)
        ref_l = [l1v[:, s.center], a2v[:, s.center], a3v[:, s.center]]
        aligned = []
        for i in range(N):
            nbr_l = [l1v[:, i], a2v[:, i], a3v[:, i]]
            flow = s.spynet(t_up(x[:, i], 4), t_up(x_center, 4))
            aligned.append(s.pod(nbr_l, ref_l, x[:, i], x_center, flow))
        fea = s.tsa(torch.stack(aligned, 1))

        out = s.recon_trunk(fea)
        out = t_lrelu(F.pixel_shuffle(s.upconv1(out), 2))
        out = t_lrelu(F.pixel_shuffle(s.upconv2(out), 2))
        out = t_lrelu(F.pixel_shuffle(s.upconv3(out), 2))
        out = t_lrelu(F.pixel_shuffle(s.upconv4(out), 2))
        out = s.conv_last(t_lrelu(s.HRconv(out)))
        return out + t_up(x_center, 16)


def _oracle_state_dict(tm: TGPEMSR) -> dict:
    """Rename the oracle's attributes to the reference checkpoint keys."""
    sd = {}
    ren = {
        "vgg_c1.": "vgg.slice1.0.", "vgg_c2.": "vgg.slice1.2.",
        "indexer.": "refmodel.indexer.", "decoder.": "refmodel.decoder.",
        "embedding.": "refmodel.codebook.embedding.",
        "pod.": "align_module.", "spynet.mods.": "align_module.spynet.basic_module.",
        "tsa.": "ThreeDA.",
    }
    for k, v in tm.state_dict().items():
        for a, b in ren.items():
            if k.startswith(a):
                k = b + k[len(a):]
                break
        # DCNPack key names inside align_module already match (L3_dcnpack...)
        # spynet inner Sequential indices need the basic_module. infix
        if k.startswith("align_module.spynet.basic_module."):
            parts = k.split(".")
            k = ".".join(parts[:4] + ["basic_module"] + parts[4:])
        sd[k] = v
    return sd


def test_gpemsr_full_net_parity(rng):
    from gpemsr_tpu.models.gpemsr import GPEMSR

    torch.manual_seed(11)
    prior = tiny_prior(16)
    tm = TGPEMSR(prior).eval()
    # reference decoder channel widths assumed by the oracle fusion convs
    assert list(prior.decoder.channel_list) == [32, 16, 16, 8, 8]

    sd = _oracle_state_dict(tm)
    cfg = GPEMSRConfig(nf=NF, groups=G, front_RBs=1, back_RBs=1,
                       ref_fusion_feat_RBs=1, scale=16, prior=prior)
    params = {"params": cv.convert_gpemsr(sd, cfg)}

    x = rng.uniform(0, 1, (1, 5, 8, 8, 1)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 1, 4, 2, 3))).numpy()

    model = GPEMSR(cfg)
    out, ref_imgs = model.apply(params, jnp.asarray(x))
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=2e-3)
    assert ref_imgs.shape == (1, 5, 128, 128, 1)
