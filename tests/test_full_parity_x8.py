"""Full GPEMSR x8 end-to-end parity (VERDICT #6).

The x8 forward differs structurally from x16 (GPEMSR.py:379-415,447-448):
Indexer8 halves the LR grid so the VGG mask lives at H/2, the prior fusion
has 3 levels (reffusionconv1..3, reduce_dim 4nf->nf, no down_fea_conv3),
and the upsampler runs 3 PixelShuffle stages with an x8 bilinear base.
This pins that wiring against a torch oracle assembled from the component
oracles, weights converted with `convert_gpemsr`."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from gpemsr_tpu.core.config import GPEMSRConfig
from gpemsr_tpu.models import convert as cv
from tests.test_convert import TDecoder, TIndexer
from tests.test_convert_gpemsr import TPOD, TThreeDA
from tests.test_full_parity import (
    TResNoBN, TSpyNet, _oracle_state_dict, t_lrelu, t_up,
)
from tests.test_models import tiny_prior

NF = 16
G = 4


class TGPEMSR8(nn.Module):
    """x8 oracle with the reference state_dict layout (mode='8to1')."""

    def __init__(s, prior, nf=NF, groups=G, front_rbs=1, back_rbs=1,
                 fusion_rbs=1, nframes=5):
        super().__init__()
        s.nf, s.center, s.scale = nf, nframes // 2, 8
        s.conv_first = nn.Conv2d(1, nf, 3, 1, 1)
        s.feature_extraction = nn.Sequential(
            *[TResNoBN(nf) for _ in range(front_rbs)])
        s.vgg_c1 = nn.Conv2d(3, 64, 3, 1, 1)
        s.vgg_c2 = nn.Conv2d(64, 64, 3, 1, 1)
        s.refmaskconv1 = nn.Conv2d(1, nf, 3, 1, 1)
        s.refmaskconv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        s.refmaskconv3 = nn.Conv2d(nf, 1, 3, 1, 1)
        s.reffea_L2_conv1 = nn.ConvTranspose2d(nf, nf, 3, 2, 1, 1)
        s.reffea_L3_conv1 = nn.ConvTranspose2d(nf, nf, 3, 2, 1, 1)
        dch = list(prior.decoder.channel_list)
        # x8 fusion: 3 levels (GPEMSR.py:402-415)
        s.reffusionconv1 = nn.Conv2d(nf + dch[3], nf, 3, 1, 1)
        s.fusion_fea_block1 = nn.Sequential(
            *[TResNoBN(nf) for _ in range(fusion_rbs)])
        s.down_fea_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        s.reffusionconv2 = nn.Conv2d(2 * nf + dch[2], nf, 3, 1, 1)
        s.fusion_fea_block2 = nn.Sequential(
            *[TResNoBN(nf) for _ in range(fusion_rbs)])
        s.down_fea_conv2 = nn.Conv2d(2 * nf, 2 * nf, 3, 2, 1)
        s.reffusionconv3 = nn.Conv2d(3 * nf + dch[1], nf, 3, 1, 1)
        s.fusion_fea_block3 = nn.Sequential(
            *[TResNoBN(nf) for _ in range(fusion_rbs)])
        s.reduce_dim_conv = nn.Conv2d(4 * nf, nf, 1, 1, 0)
        # frozen prior (Indexer8: one DownBlock, latent grid = LR/2)
        s.indexer = TIndexer(prior.indexer, 8)
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
        # 3 upsample stages (GPEMSR.py:311-315 '8to1')
        s.upconv1 = nn.Conv2d(nf, nf * 4, 3, 1, 1)
        s.upconv2 = nn.Conv2d(nf, 64 * 4, 3, 1, 1)
        s.upconv3 = nn.Conv2d(64, 64 * 4, 3, 1, 1)
        s.HRconv = nn.Conv2d(64, 64, 3, 1, 1)
        s.conv_last = nn.Conv2d(64, 1, 3, 1, 1)

    def vgg12(s, x):
        return F.relu(s.vgg_c2(F.relu(s.vgg_c1(x))))

    def ref_extract(s, lr):
        logits = s.indexer(lr)
        idx = logits.argmax(-1)
        z_q = s.embedding(idx).permute(0, 3, 1, 2)
        return s.decoder(z_q, multi_scale=True)

    def forward(s, x):
        B, N, C, H, W = x.shape
        x_center = x[:, s.center]
        xf = x.reshape(-1, C, H, W)
        l1 = s.feature_extraction(t_lrelu(s.conv_first(xf)))

        # prior branch: only L2/L3 transposed-conv levels at x8
        l2 = t_lrelu(s.reffea_L2_conv1(l1))
        l3 = t_lrelu(s.reffea_L3_conv1(l2))
        rx16, rx8, rx4, rx2, rimg = s.ref_extract(xf)
        up_lr = t_up(xf, 8)
        fr = F.normalize(F.unfold(s.vgg12(rimg.expand(-1, 3, -1, -1)), 16,
                                  stride=16), dim=1)
        fl = F.normalize(F.unfold(s.vgg12(up_lr.expand(-1, 3, -1, -1)), 16,
                                  stride=16), dim=1)
        # mask lives on the latent grid H/2 (GPEMSR.py:396)
        mask = (fr * fl).sum(1, keepdim=True).reshape(B * N, 1, H // 2, W // 2)
        mask = torch.sigmoid(s.refmaskconv3(t_lrelu(s.refmaskconv2(
            t_lrelu(s.refmaskconv1(mask))))))

        r2 = s.reffusionconv1(torch.cat((l3, rx2), 1))
        r2 = s.fusion_fea_block1(r2) * t_up(mask, 8)
        r2 = s.down_fea_conv1(r2)
        r4 = s.reffusionconv2(torch.cat((l2, rx4, r2), 1))
        r4 = s.fusion_fea_block2(r4) * t_up(mask, 4)
        r4 = s.down_fea_conv2(torch.cat((r4, r2), 1))
        r8 = s.reffusionconv3(torch.cat((l1, rx8, r4), 1))
        r8 = s.fusion_fea_block3(r8) * t_up(mask, 2)
        l1 = s.reduce_dim_conv(torch.cat((r8, r4, l1), 1))

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
        out = s.conv_last(t_lrelu(s.HRconv(out)))
        return out + t_up(x_center, 8)


def test_gpemsr_x8_full_net_parity(rng):
    from gpemsr_tpu.models.gpemsr import GPEMSR

    torch.manual_seed(13)
    prior = tiny_prior(8)
    tm = TGPEMSR8(prior).eval()
    assert list(prior.decoder.channel_list) == [32, 16, 16, 8, 8]

    sd = _oracle_state_dict(tm)
    cfg = GPEMSRConfig(nf=NF, groups=G, front_RBs=1, back_RBs=1,
                       ref_fusion_feat_RBs=1, scale=8, prior=prior)
    params = {"params": cv.convert_gpemsr(sd, cfg)}

    # H=16 so the latent grid (H/2=8) spans several 16x16 VGG patches of the
    # x8-upsampled 128px image
    x = rng.uniform(0, 1, (1, 5, 16, 16, 1)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 1, 4, 2, 3))).numpy()

    model = GPEMSR(cfg)
    out, ref_imgs = model.apply(params, jnp.asarray(x))
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=2e-3)
    assert ref_imgs.shape == (1, 5, 128, 128, 1)
