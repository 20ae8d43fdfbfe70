"""GPEMSR component weight-conversion golden tests (ThreeDA fusion and POD
alignment against torch oracles built from the checkpoint key layout)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gpemsr_tpu.models import convert as cv


class TThreeDA(nn.Module):
    """Torch oracle with the reference ThreeDA key layout (GPEMSR.py:143-222)."""

    def __init__(s, nf, t, center):
        super().__init__()
        s.center = center
        s.temporal_attn1 = nn.Conv2d(nf, nf, 3, 1, 1)
        s.temporal_attn2 = nn.Conv2d(nf, nf, 3, 1, 1)
        s.feat_fusion = nn.Conv2d(t * nf, nf, 1)
        s.conv3D_1 = nn.Conv3d(t, t, 1)
        s.conv3D_2 = nn.Conv3d(t, t, 1)
        s.conv3D_fusion_1 = nn.Conv2d(t * nf, nf, 1)
        s.conv3D_fusion_2 = nn.Conv2d(t * nf, nf, 1)
        s.conv2D_fusion_3 = nn.Conv2d(nf, nf, 1)
        s.spatial_attn1 = nn.Conv2d(t * nf, nf, 1)
        s.spatial_attn2 = nn.Conv2d(nf * 2, nf, 1)
        s.spatial_attn3 = nn.Conv2d(nf, nf, 3, 1, 1)
        s.spatial_attn4 = nn.Conv2d(nf, nf, 1)
        s.spatial_attn5 = nn.Conv2d(nf, nf, 3, 1, 1)
        s.spatial_attn_l1 = nn.Conv2d(nf, nf, 1)
        s.spatial_attn_l2 = nn.Conv2d(nf * 2, nf, 3, 1, 1)
        s.spatial_attn_l3 = nn.Conv2d(nf, nf, 3, 1, 1)
        s.spatial_attn_add1 = nn.Conv2d(nf, nf, 1)
        s.spatial_attn_add2 = nn.Conv2d(nf, nf, 1)

    def forward(s, x):            # [B, T, C, H, W]
        b, t, c, h, w = x.shape
        lr = lambda v: F.leaky_relu(v, 0.1)
        emb_ref = s.temporal_attn1(x[:, s.center])
        emb = s.temporal_attn2(x.reshape(-1, c, h, w)).reshape(b, t, -1, h, w)
        prob = torch.sigmoid((emb * emb_ref.unsqueeze(1)).sum(2))  # [b,t,h,w]
        feat_w = x * prob.unsqueeze(2)
        flat = feat_w.reshape(b, -1, h, w)
        feat = lr(s.feat_fusion(flat))
        f3d1 = lr(s.conv3D_1(feat_w))
        f3d1 = lr(s.conv3D_fusion_1(f3d1.reshape(b, -1, h, w)))
        f3d2 = lr(s.conv3D_2(feat_w))
        f3d2 = lr(s.conv3D_fusion_2(f3d2.reshape(b, -1, h, w)))
        feat = feat + f3d1
        f3d3 = s.conv2D_fusion_3(feat)
        attn = lr(s.spatial_attn1(flat))
        amax = F.max_pool2d(attn, 3, 2, 1)
        aavg = F.avg_pool2d(attn, 3, 2, 1, count_include_pad=True)
        attn = lr(s.spatial_attn2(torch.cat([amax, aavg], 1)))
        attn_l = lr(s.spatial_attn_l1(attn))
        amax = F.max_pool2d(attn_l, 3, 2, 1)
        aavg = F.avg_pool2d(attn_l, 3, 2, 1, count_include_pad=True)
        attn_l = lr(s.spatial_attn_l2(torch.cat([amax, aavg], 1)))
        attn_l = lr(s.spatial_attn_l3(attn_l))
        attn_l = F.interpolate(attn_l, scale_factor=2, mode="bilinear",
                               align_corners=False)
        attn = lr(s.spatial_attn3(attn)) + attn_l
        attn = lr(s.spatial_attn4(attn))
        attn = F.interpolate(attn, scale_factor=2, mode="bilinear",
                             align_corners=False)
        attn = s.spatial_attn5(attn)
        attn_add = s.spatial_attn_add2(lr(s.spatial_attn_add1(attn)))
        attn = torch.sigmoid(attn)
        return feat * attn * 2 + attn_add + f3d2 + f3d3


def test_threeda_conversion(rng):
    from gpemsr_tpu.models.gpemsr import ThreeDA

    torch.manual_seed(0)
    nf, t = 16, 5
    tm = TThreeDA(nf, t, center=2).eval()
    x = rng.standard_normal((2, t, 8, 8, nf)).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 1, 4, 2, 3))
    with torch.no_grad():
        ref = tm(tx).numpy()

    sd = {f"ThreeDA.{k}": v for k, v in tm.state_dict().items()}
    tree = cv._Tree()
    cv._convert_threeda_into(tree, sd, "ThreeDA", ())
    params = {"params": tree.tree()}
    out = ThreeDA(nf=nf, nframes=t, center=2).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=3e-4)


class TDCNPack(nn.Module):
    """DCNv2Pack key layout: conv_offset + weight/bias; forward via the
    explicit grid-sample formulation verified in test_ops."""

    def __init__(s, nf, groups):
        super().__init__()
        s.groups = groups
        s.conv_offset = nn.Conv2d(nf, 3 * groups * 9, 3, 1, 1)
        s.weight = nn.Parameter(torch.randn(nf, nf, 3, 3) * 0.05)
        s.bias = nn.Parameter(torch.randn(nf))

    def forward(s, x, feat):
        out = s.conv_offset(feat)
        o1, o2, mask = torch.chunk(out, 3, dim=1)
        offset = torch.cat((o1, o2), dim=1)
        mask = torch.sigmoid(mask)
        from tests.test_ops import _torch_deform_conv2d
        return _torch_deform_conv2d(x, offset, mask, s.weight, s.bias,
                                    groups=s.groups)


class TPOD(nn.Module):
    """POD oracle (flows precomputed outside; key layout of GPEMSR.py:64-140)."""

    def __init__(s, nf, groups):
        super().__init__()
        s.flowdsconv0_1 = nn.Conv2d(2, 16, 3, 4, 1)
        s.flowdsconv0_2 = nn.Conv2d(2, 16, 3, 4, 1)
        s.flowdsconv1_1 = nn.Conv2d(16, 16, 3, 2, 1)
        s.flowdsconv1_2 = nn.Conv2d(16, 16, 3, 2, 1)
        s.flowdsconv2_1 = nn.Conv2d(16, 16, 3, 2, 1)
        s.flowdsconv2_2 = nn.Conv2d(16, 16, 3, 2, 1)
        s.L3_offset_conv1 = nn.Conv2d(nf * 2 + 34, nf, 3, 1, 1)
        s.L3_offset_conv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        s.L3_dcnpack = TDCNPack(nf, groups)
        s.L2_offset_conv1 = nn.Conv2d(nf * 2 + 34, nf, 3, 1, 1)
        s.L2_offset_conv2 = nn.Conv2d(nf * 2, nf, 3, 1, 1)
        s.L2_offset_conv3 = nn.Conv2d(nf, nf, 3, 1, 1)
        s.L2_dcnpack = TDCNPack(nf, groups)
        s.L2_fea_conv = nn.Conv2d(nf * 2, nf, 3, 1, 1)
        s.L1_offset_conv1 = nn.Conv2d(nf * 2 + 34, nf, 3, 1, 1)
        s.L1_offset_conv2 = nn.Conv2d(nf * 2, nf, 3, 1, 1)
        s.L1_offset_conv3 = nn.Conv2d(nf, nf, 3, 1, 1)
        s.L1_dcnpack = TDCNPack(nf, groups)
        s.L1_fea_conv = nn.Conv2d(nf * 2, nf, 3, 1, 1)
        s.cas_offset_conv1 = nn.Conv2d(nf * 2, nf, 3, 1, 1)
        s.cas_offset_conv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        s.cas_dcnpack = TDCNPack(nf, groups)

    def forward(s, nbr, ref, nbr_frame, ref_frame, flow):
        lr = lambda v: F.leaky_relu(v, 0.1)
        up = lambda v: F.interpolate(v, scale_factor=2, mode="bilinear",
                                     align_corners=False)
        f1l1 = s.flowdsconv0_1(flow)
        f2l1 = s.flowdsconv0_2(flow)
        f1l2 = s.flowdsconv1_1(f1l1)
        f2l2 = s.flowdsconv1_2(f2l1)
        f1l3 = s.flowdsconv2_1(f1l2)
        f2l3 = s.flowdsconv2_2(f2l2)
        nfl2 = F.interpolate(nbr_frame, scale_factor=0.5, mode="bilinear",
                             align_corners=False)
        rfl2 = F.interpolate(ref_frame, scale_factor=0.5, mode="bilinear",
                             align_corners=False)
        nfl3 = F.interpolate(nfl2, scale_factor=0.5, mode="bilinear",
                             align_corners=False)
        rfl3 = F.interpolate(rfl2, scale_factor=0.5, mode="bilinear",
                             align_corners=False)
        o3 = lr(s.L3_offset_conv1(torch.cat(
            [nbr[2], ref[2], f1l3, f2l3, nfl3, rfl3], 1)))
        o3 = lr(s.L3_offset_conv2(o3))
        fe3 = lr(s.L3_dcnpack(nbr[2], o3))
        o2 = lr(s.L2_offset_conv1(torch.cat(
            [nbr[1], ref[1], f1l2, f2l2, nfl2, rfl2], 1)))
        o2 = lr(s.L2_offset_conv2(torch.cat([o2, up(o3) * 2], 1)))
        o2 = lr(s.L2_offset_conv3(o2))
        fe2 = s.L2_dcnpack(nbr[1], o2)
        fe2 = lr(s.L2_fea_conv(torch.cat([fe2, up(fe3)], 1)))
        o1 = lr(s.L1_offset_conv1(torch.cat(
            [nbr[0], ref[0], f1l1, f2l1, nbr_frame, ref_frame], 1)))
        o1 = lr(s.L1_offset_conv2(torch.cat([o1, up(o2) * 2], 1)))
        o1 = lr(s.L1_offset_conv3(o1))
        fe1 = s.L1_dcnpack(nbr[0], o1)
        fe1 = s.L1_fea_conv(torch.cat([fe1, up(fe2)], 1))
        cas = lr(s.cas_offset_conv1(torch.cat([fe1, ref[0]], 1)))
        cas = lr(s.cas_offset_conv2(cas))
        return lr(s.cas_dcnpack(fe1, cas))


def test_pod_conversion(rng):
    """POD with converted weights matches the torch oracle (flows injected via
    a stub SpyNet so both sides see identical flow inputs)."""
    from gpemsr_tpu.models.gpemsr import POD

    torch.manual_seed(1)
    nf, G = 16, 4
    tm = TPOD(nf, G).eval()
    B, H, W = 2, 16, 16
    nbr = [rng.standard_normal((B, H // f, W // f, nf)).astype(np.float32)
           for f in (1, 2, 4)]
    ref = [rng.standard_normal((B, H // f, W // f, nf)).astype(np.float32)
           for f in (1, 2, 4)]
    nbr_frame = rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32)
    ref_frame = rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32)
    flow = (rng.standard_normal((B, 4 * H, 4 * W, 2)) * 2).astype(np.float32)

    def nchw(a):
        return torch.from_numpy(np.ascontiguousarray(
            a.transpose(0, 3, 1, 2)))

    with torch.no_grad():
        ref_out = tm([nchw(v) for v in nbr], [nchw(v) for v in ref],
                     nchw(nbr_frame), nchw(ref_frame), nchw(flow)).numpy()

    sd = {f"align_module.{k}": v for k, v in tm.state_dict().items()}
    tree = cv._Tree()
    cv._convert_pod_into(tree, sd, "align_module", ())
    params = {"params": tree.tree()}

    class StubSpyNet:
        def __call__(self, a, b):
            return jnp.asarray(flow)

    out = POD(nf=nf, groups=G).apply(
        params, [jnp.asarray(v) for v in nbr], [jnp.asarray(v) for v in ref],
        jnp.asarray(nbr_frame), jnp.asarray(ref_frame), StubSpyNet())
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref_out,
                               atol=5e-4)


def test_convert_gpemsr_full_tree_congruence(rng):
    """A synthetic stage-3 state_dict with the reference's exact key layout
    converts into a tree identical (paths + shapes) to GPEMSR.init's."""
    from gpemsr_tpu.core.config import GPEMSRConfig
    from gpemsr_tpu.models.gpemsr import GPEMSR
    from tests.test_convert import TDecoder, TEncoder, TIndexer
    from tests.test_models import tiny_prior
    from flax.traverse_util import flatten_dict

    prior = tiny_prior(16)
    cfg = GPEMSRConfig(nf=16, groups=4, front_RBs=1, back_RBs=1,
                       ref_fusion_feat_RBs=1, scale=16, prior=prior)
    nf = cfg.nf

    sd = {}

    def conv(name, co, ci, k=3):
        sd[f"{name}.weight"] = torch.randn(co, ci, k, k) * 0.05
        sd[f"{name}.bias"] = torch.randn(co)

    def convT(name, ci, co, k=3):
        sd[f"{name}.weight"] = torch.randn(ci, co, k, k) * 0.05
        sd[f"{name}.bias"] = torch.randn(co)

    def res_nobn(name, c):
        conv(f"{name}.conv1", c, c)
        conv(f"{name}.conv2", c, c)

    def dcn(name, c, g):
        conv(f"{name}.conv_offset", 3 * g * 9, c)
        sd[f"{name}.weight"] = torch.randn(c, c, 3, 3) * 0.05
        sd[f"{name}.bias"] = torch.randn(c)

    conv("conv_first", nf, 1)
    res_nobn("feature_extraction.0", nf)
    # vgg slice1 (relu1_2)
    conv("vgg.slice1.0", 64, 3)
    conv("vgg.slice1.2", 64, 64)
    conv("refmaskconv1", nf, 1)
    conv("refmaskconv2", nf, nf)
    conv("refmaskconv3", 1, nf)
    for name in ("reffea_L2_conv1", "reffea_L3_conv1", "reffea_L4_conv1"):
        convT(name, nf, nf)
    dch = list(prior.decoder.channel_list)       # (32, 16, 16, 8, 8)
    conv("reffusionconv1", nf, nf + dch[3])      # L4 + ref_x2
    res_nobn("fusion_fea_block1.0", nf)
    conv("down_fea_conv1", nf, nf)
    conv("reffusionconv2", nf, 2 * nf + dch[2])
    res_nobn("fusion_fea_block2.0", nf)
    conv("down_fea_conv2", 2 * nf, 2 * nf)
    conv("reffusionconv3", nf, 3 * nf + dch[1])
    res_nobn("fusion_fea_block3.0", nf)
    conv("down_fea_conv3", 3 * nf, 3 * nf)
    conv("reffusionconv4", nf, 4 * nf + dch[0])
    res_nobn("fusion_fea_block4.0", nf)
    conv("reduce_dim_conv", nf, 5 * nf, k=1)

    # frozen prior (reference module layouts)
    torch.manual_seed(3)
    enc = TEncoder(prior.encoder)
    dec = TDecoder(prior.decoder)
    idx = TIndexer(prior.indexer, 16)
    for mod, pre in ((enc, "refmodel.encoder."), (dec, "refmodel.decoder."),
                     (idx, "refmodel.indexer.")):
        for k, v in mod.state_dict().items():
            sd[pre + k] = v
    sd["refmodel.codebook.embedding.weight"] = torch.randn(
        prior.codebook.num_codebook_vectors, prior.codebook.latent_dim)

    for name in ("fea_L2_conv1", "fea_L3_conv1"):
        conv(name, nf, nf)
    for name in ("fea_L2_conv2", "fea_L3_conv2"):
        conv(name, nf, nf)
    # POD
    a = "align_module"
    for i in ("0_1", "0_2", "1_1", "1_2", "2_1", "2_2"):
        conv(f"{a}.flowdsconv{i}", 16, 2 if i.startswith("0") else 16)
    for lv in ("L3", "L2", "L1"):
        conv(f"{a}.{lv}_offset_conv1", nf, nf * 2 + 34)
        conv(f"{a}.{lv}_offset_conv2", nf, nf if lv == "L3" else nf * 2)
        if lv != "L3":
            conv(f"{a}.{lv}_offset_conv3", nf, nf)
            conv(f"{a}.{lv}_fea_conv", nf, nf * 2)
        dcn(f"{a}.{lv}_dcnpack", nf, cfg.groups)
    conv(f"{a}.cas_offset_conv1", nf, nf * 2)
    conv(f"{a}.cas_offset_conv2", nf, nf)
    dcn(f"{a}.cas_dcnpack", nf, cfg.groups)
    # spynet (6 levels)
    widths = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
    for lv in range(6):
        for j, (ci, co) in enumerate(widths):
            conv(f"{a}.spynet.basic_module.{lv}.basic_module.{2 * j}", co, ci,
                 k=7)
    # ThreeDA
    t = cfg.nframes
    conv("ThreeDA.temporal_attn1", nf, nf)
    conv("ThreeDA.temporal_attn2", nf, nf)
    conv("ThreeDA.feat_fusion", nf, t * nf, k=1)
    for name in ("conv3D_1", "conv3D_2"):
        sd[f"ThreeDA.{name}.weight"] = torch.randn(t, t, 1, 1, 1) * 0.1
        sd[f"ThreeDA.{name}.bias"] = torch.randn(t)
    conv("ThreeDA.conv3D_fusion_1", nf, t * nf, k=1)
    conv("ThreeDA.conv3D_fusion_2", nf, t * nf, k=1)
    conv("ThreeDA.conv2D_fusion_3", nf, nf, k=1)
    conv("ThreeDA.spatial_attn1", nf, t * nf, k=1)
    conv("ThreeDA.spatial_attn2", nf, 2 * nf, k=1)
    conv("ThreeDA.spatial_attn3", nf, nf)
    conv("ThreeDA.spatial_attn4", nf, nf, k=1)
    conv("ThreeDA.spatial_attn5", nf, nf)
    conv("ThreeDA.spatial_attn_l1", nf, nf, k=1)
    conv("ThreeDA.spatial_attn_l2", nf, 2 * nf)
    conv("ThreeDA.spatial_attn_l3", nf, nf)
    conv("ThreeDA.spatial_attn_add1", nf, nf, k=1)
    conv("ThreeDA.spatial_attn_add2", nf, nf, k=1)
    res_nobn("recon_trunk.0", nf)     # back_RBs=1 (converted below)
    conv("upconv1", nf * 4, nf)
    conv("upconv2", 64 * 4, nf)
    conv("upconv3", 64 * 4, 64)
    conv("upconv4", 64 * 4, 64)
    conv("HRconv", 64, 64)
    conv("conv_last", 1, 64)

    tree = cv.convert_gpemsr(sd, cfg)

    model = GPEMSR(cfg)
    x = jnp.zeros((1, 5, 8, 8, 1), jnp.float32)
    ref_tree = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))

    got = {k: v.shape for k, v in flatten_dict(tree).items()}
    want = {k[1:]: v.shape for k, v in
            flatten_dict(jax.tree_util.tree_map(lambda a: a, ref_tree)).items()
            if k[0] == "params"}
    missing = sorted(set(map(str, want)) - set(map(str, got)))
    extra = sorted(set(map(str, got)) - set(map(str, want)))
    assert not missing, f"converter missing params: {missing[:8]}"
    assert not extra, f"converter extra params: {extra[:8]}"
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


def test_convert_gpemsr_x8_tree_congruence(rng):
    """Same congruence check for the 8to1 layout (3 fusion levels, one fewer
    reffea/upconv, reduce_dim over 4*nf)."""
    from gpemsr_tpu.core.config import GPEMSRConfig
    from gpemsr_tpu.models.gpemsr import GPEMSR
    from tests.test_convert import TDecoder, TIndexer
    from tests.test_models import tiny_prior
    from flax.traverse_util import flatten_dict

    prior = tiny_prior(8)
    cfg = GPEMSRConfig(nf=16, groups=4, front_RBs=1, back_RBs=1,
                       ref_fusion_feat_RBs=1, scale=8, prior=prior)
    nf = cfg.nf
    sd = {}

    def conv(name, co, ci, k=3):
        sd[f"{name}.weight"] = torch.randn(co, ci, k, k) * 0.05
        sd[f"{name}.bias"] = torch.randn(co)

    def convT(name, ci, co, k=3):
        sd[f"{name}.weight"] = torch.randn(ci, co, k, k) * 0.05
        sd[f"{name}.bias"] = torch.randn(co)

    def res_nobn(name, c):
        conv(f"{name}.conv1", c, c)
        conv(f"{name}.conv2", c, c)

    def dcn(name, c, g):
        conv(f"{name}.conv_offset", 3 * g * 9, c)
        sd[f"{name}.weight"] = torch.randn(c, c, 3, 3) * 0.05
        sd[f"{name}.bias"] = torch.randn(c)

    conv("conv_first", nf, 1)
    res_nobn("feature_extraction.0", nf)
    conv("vgg.slice1.0", 64, 3)
    conv("vgg.slice1.2", 64, 64)
    conv("refmaskconv1", nf, 1)
    conv("refmaskconv2", nf, nf)
    conv("refmaskconv3", 1, nf)
    for name in ("reffea_L2_conv1", "reffea_L3_conv1"):
        convT(name, nf, nf)
    dch = list(prior.decoder.channel_list)
    conv("reffusionconv1", nf, nf + dch[3])
    res_nobn("fusion_fea_block1.0", nf)
    conv("down_fea_conv1", nf, nf)
    conv("reffusionconv2", nf, 2 * nf + dch[2])
    res_nobn("fusion_fea_block2.0", nf)
    conv("down_fea_conv2", 2 * nf, 2 * nf)
    conv("reffusionconv3", nf, 3 * nf + dch[1])
    res_nobn("fusion_fea_block3.0", nf)
    conv("reduce_dim_conv", nf, 4 * nf, k=1)
    torch.manual_seed(5)
    for mod, pre in ((TDecoder(prior.decoder), "refmodel.decoder."),
                     (TIndexer(prior.indexer, 8), "refmodel.indexer.")):
        for k, v in mod.state_dict().items():
            sd[pre + k] = v
    sd["refmodel.codebook.embedding.weight"] = torch.randn(
        prior.codebook.num_codebook_vectors, prior.codebook.latent_dim)
    for name in ("fea_L2_conv1", "fea_L2_conv2", "fea_L3_conv1", "fea_L3_conv2"):
        conv(name, nf, nf)
    a = "align_module"
    for i in ("0_1", "0_2", "1_1", "1_2", "2_1", "2_2"):
        conv(f"{a}.flowdsconv{i}", 16, 2 if i.startswith("0") else 16)
    for lv in ("L3", "L2", "L1"):
        conv(f"{a}.{lv}_offset_conv1", nf, nf * 2 + 34)
        conv(f"{a}.{lv}_offset_conv2", nf, nf if lv == "L3" else nf * 2)
        if lv != "L3":
            conv(f"{a}.{lv}_offset_conv3", nf, nf)
            conv(f"{a}.{lv}_fea_conv", nf, nf * 2)
        dcn(f"{a}.{lv}_dcnpack", nf, cfg.groups)
    conv(f"{a}.cas_offset_conv1", nf, nf * 2)
    conv(f"{a}.cas_offset_conv2", nf, nf)
    dcn(f"{a}.cas_dcnpack", nf, cfg.groups)
    widths = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
    for lv in range(6):
        for j, (ci, co) in enumerate(widths):
            conv(f"{a}.spynet.basic_module.{lv}.basic_module.{2 * j}", co, ci,
                 k=7)
    t = cfg.nframes
    conv("ThreeDA.temporal_attn1", nf, nf)
    conv("ThreeDA.temporal_attn2", nf, nf)
    conv("ThreeDA.feat_fusion", nf, t * nf, k=1)
    for name in ("conv3D_1", "conv3D_2"):
        sd[f"ThreeDA.{name}.weight"] = torch.randn(t, t, 1, 1, 1) * 0.1
        sd[f"ThreeDA.{name}.bias"] = torch.randn(t)
    conv("ThreeDA.conv3D_fusion_1", nf, t * nf, k=1)
    conv("ThreeDA.conv3D_fusion_2", nf, t * nf, k=1)
    conv("ThreeDA.conv2D_fusion_3", nf, nf, k=1)
    conv("ThreeDA.spatial_attn1", nf, t * nf, k=1)
    conv("ThreeDA.spatial_attn2", nf, 2 * nf, k=1)
    conv("ThreeDA.spatial_attn3", nf, nf)
    conv("ThreeDA.spatial_attn4", nf, nf, k=1)
    conv("ThreeDA.spatial_attn5", nf, nf)
    conv("ThreeDA.spatial_attn_l1", nf, nf, k=1)
    conv("ThreeDA.spatial_attn_l2", nf, 2 * nf)
    conv("ThreeDA.spatial_attn_l3", nf, nf)
    conv("ThreeDA.spatial_attn_add1", nf, nf, k=1)
    conv("ThreeDA.spatial_attn_add2", nf, nf, k=1)
    res_nobn("recon_trunk.0", nf)
    conv("upconv1", nf * 4, nf)
    conv("upconv2", 64 * 4, nf)
    conv("upconv3", 64 * 4, 64)
    conv("HRconv", 64, 64)
    conv("conv_last", 1, 64)

    tree = cv.convert_gpemsr(sd, cfg)
    model = GPEMSR(cfg)
    x = jnp.zeros((1, 5, 8, 8, 1), jnp.float32)
    ref_tree = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    got = {k: v.shape for k, v in flatten_dict(tree).items()}
    want = {k[1:]: v.shape for k, v in flatten_dict(ref_tree).items()
            if k[0] == "params"}
    assert sorted(map(str, got)) == sorted(map(str, want))
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])
