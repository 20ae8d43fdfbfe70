"""Torch-checkpoint -> flax-params conversion.

The reference ships pretrained checkpoints (stage1/stage2/stage3 .pth, SpyNet,
VGG19, superhuman/MALA .pt — SURVEY §5.4). These functions map their
state_dict key layouts onto our NHWC flax parameter trees so converted weights
reproduce reference numerics bit-closely (validated in tests/test_convert.py
against freshly-initialised torch oracles)."""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp
from flax.traverse_util import unflatten_dict

from gpemsr_tpu.core.config import (
    DecoderConfig, DiscriminatorConfig, EncoderConfig, IndexerConfig, PriorConfig,
)


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_w(t):
    """torch Conv2d [Co, Ci, kh, kw] -> flax [kh, kw, Ci, Co]."""
    return jnp.asarray(_np(t).transpose(2, 3, 1, 0))


def conv3d_w(t):
    """torch Conv3d [Co, Ci, kd, kh, kw] -> flax [kd, kh, kw, Ci, Co]."""
    return jnp.asarray(_np(t).transpose(2, 3, 4, 1, 0))


def convT_w(t):
    """torch ConvTranspose2d [Ci, Co, kh, kw] -> our [kh, kw, Ci, Co]."""
    return jnp.asarray(_np(t).transpose(2, 3, 0, 1))


def linear_w(t):
    """torch Linear [out, in] -> flax Dense [in, out]."""
    return jnp.asarray(_np(t).T)


def vec(t):
    return jnp.asarray(_np(t))


class _Tree:
    """Accumulates (path, value) pairs into a nested params dict."""

    def __init__(self):
        self.flat = {}

    def put(self, path, value):
        key = tuple(p for p in path if p)
        assert key not in self.flat, f"duplicate param {key}"
        self.flat[key] = value

    def conv(self, sd, src, dst, bias=True):
        self.put(dst + ("conv", "kernel"), conv_w(sd[f"{src}.weight"]))
        if bias and f"{src}.bias" in sd:
            self.put(dst + ("conv", "bias"), vec(sd[f"{src}.bias"]))

    def raw_conv(self, sd, src, dst, bias=True):
        """flax nn.Conv used directly (no Conv wrapper)."""
        self.put(dst + ("kernel",), conv_w(sd[f"{src}.weight"]))
        if bias and f"{src}.bias" in sd:
            self.put(dst + ("bias",), vec(sd[f"{src}.bias"]))

    def convT(self, sd, src, dst):
        self.put(dst + ("kernel",), convT_w(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            self.put(dst + ("bias",), vec(sd[f"{src}.bias"]))

    def gn(self, sd, src, dst):
        self.put(dst + ("gn", "scale"), vec(sd[f"{src}.weight"]))
        self.put(dst + ("gn", "bias"), vec(sd[f"{src}.bias"]))

    def tree(self):
        return unflatten_dict(self.flat)


# ---------------------------------------------------------------------------
# Prior building blocks (reference model/blocks.py layouts)
# ---------------------------------------------------------------------------

def _resblock(t: _Tree, sd, src, dst):
    """reference ResidualBlock: block.0 conv, block.1 GN, block.3 conv,
    block.4 GN, optional channel_up."""
    t.conv(sd, f"{src}.block.0", dst + ("conv1",))
    t.gn(sd, f"{src}.block.1", dst + ("norm1",))
    t.conv(sd, f"{src}.block.3", dst + ("conv2",))
    t.gn(sd, f"{src}.block.4", dst + ("norm2",))
    if f"{src}.channel_up.weight" in sd:
        t.conv(sd, f"{src}.channel_up", dst + ("channel_up",))


def _nonlocal(t: _Tree, sd, src, dst):
    t.gn(sd, f"{src}.gn", dst + ("gn",))
    for nm in ("q", "k", "v", "proj_out"):
        t.conv(sd, f"{src}.{nm}", dst + (nm,))


def convert_encoder(sd: Mapping, cfg: EncoderConfig, prefix="", dst=()):
    t = _Tree()
    _convert_encoder_into(t, sd, cfg, prefix, dst)
    return t.tree()


def _convert_encoder_into(t, sd, cfg, prefix, dst):
    ch = list(cfg.channel_list)
    t.conv(sd, f"{prefix}input_layer.0", dst + ("stem",))
    idx = 0
    for i in range(len(ch) - 1):
        for j in range(cfg.num_resblock_per_scale):
            _resblock(t, sd, f"{prefix}feat_extract.{idx}", dst + (f"res{i}_{j}",))
            idx += 1
        t.conv(sd, f"{prefix}feat_extract.{idx}.downblock", dst + (f"down{i}", "down"))
        idx += 1
    if cfg.use_non_local:
        _nonlocal(t, sd, f"{prefix}feat_extract.{idx}", dst + ("nonlocal",))
        idx += 1
    for j in range(cfg.num_output_resblck):
        _resblock(t, sd, f"{prefix}output_layer.{j}", dst + (f"out_res{j}",))
    t.conv(sd, f"{prefix}output_layer.{cfg.num_output_resblck}", dst + ("to_latent",))


def convert_decoder(sd: Mapping, cfg: DecoderConfig, prefix="", dst=()):
    t = _Tree()
    _convert_decoder_into(t, sd, cfg, prefix, dst)
    return t.tree()


def _convert_decoder_into(t, sd, cfg, prefix, dst):
    ch = list(cfg.channel_list)
    t.conv(sd, f"{prefix}input_layer.0", dst + ("from_latent",))
    for j in range(cfg.num_input_resblck):
        _resblock(t, sd, f"{prefix}input_layer.{j + 1}", dst + (f"in_res{j}",))
    idx = 0
    if cfg.use_non_local:
        _nonlocal(t, sd, f"{prefix}feat_extract.{idx}", dst + ("nonlocal",))
        idx += 1
    for i in range(len(ch) - 1):
        for j in range(cfg.num_resblock_per_scale):
            _resblock(t, sd, f"{prefix}feat_extract.{idx}", dst + (f"res{i}_{j}",))
            idx += 1
        t.convT(sd, f"{prefix}feat_extract.{idx}.upblock", dst + (f"up{i}", "up"))
        idx += 1
    t.conv(sd, f"{prefix}output_layer", dst + ("to_img",))


def _convert_indexer_into(t, sd, cfg: IndexerConfig, scale, prefix, dst):
    ch = list(cfg.channel_list)
    t.conv(sd, f"{prefix}input_layer.0", dst + ("stem",))
    idx = 0
    n_trans = len(ch) - 1
    for i in range(n_trans):
        for j in range(cfg.num_resblock_per_scale - 1):
            _resblock(t, sd, f"{prefix}feat_extract.{idx}", dst + (f"res{i}_{j}",))
            idx += 1
        if scale == 8 and i == n_trans - 1:
            t.conv(sd, f"{prefix}feat_extract.{idx}.downblock",
                   dst + (f"down{i}", "down"))
        else:
            _resblock(t, sd, f"{prefix}feat_extract.{idx}", dst + (f"trans{i}",))
        idx += 1
    if cfg.use_non_local:
        _nonlocal(t, sd, f"{prefix}feat_extract.{idx}", dst + ("nonlocal",))
        idx += 1
    for j in range(cfg.num_output_resblck):
        _resblock(t, sd, f"{prefix}output_layer.{j}", dst + (f"out_res{j}",))
    t.conv(sd, f"{prefix}output_layer.{cfg.num_output_resblck}", dst + ("to_latent",))
    t.put(dst + ("classify", "kernel"), linear_w(sd[f"{prefix}embedding.weight"]))
    t.put(dst + ("classify", "bias"), vec(sd[f"{prefix}embedding.bias"]))


def convert_indexer(sd, cfg: IndexerConfig, scale=16, prefix="", dst=()):
    t = _Tree()
    _convert_indexer_into(t, sd, cfg, scale, prefix, dst)
    return t.tree()


def convert_discriminator(sd, cfg: DiscriminatorConfig, prefix=""):
    t = _Tree()
    t.raw_conv(sd, f"{prefix}model.0", ("conv0",))
    for i in range(1, cfg.n_layers + 1):
        t.raw_conv(sd, f"{prefix}model.{3 * i - 1}", (f"conv{i}",), bias=False)
    t.raw_conv(sd, f"{prefix}model.{3 * cfg.n_layers + 2}", ("head",))
    return t.tree()


def convert_vqgan_generator(sd, cfg: PriorConfig):
    """Stage-1 generator checkpoint (keys encoder./decoder./codebook.)."""
    t = _Tree()
    _convert_encoder_into(t, sd, cfg.encoder, "encoder.", ("encoder",))
    _convert_decoder_into(t, sd, cfg.decoder, "decoder.", ("decoder",))
    t.put(("codebook", "embedding"), vec(sd["codebook.embedding.weight"]))
    return t.tree()


def convert_lr_generator(sd, cfg: PriorConfig, indexer_sd=None):
    """Stage-2 composite: stage-1 keys for encoder/decoder/codebook (loaded
    strict=False in the reference, train_stage2.py:124) + the indexer from its
    own checkpoint (or the same sd with `indexer.` prefix)."""
    t = _Tree()
    _convert_encoder_into(t, sd, cfg.encoder, "encoder.", ("encoder",))
    _convert_decoder_into(t, sd, cfg.decoder, "decoder.", ("decoder",))
    t.put(("codebook", "embedding"), vec(sd["codebook.embedding.weight"]))
    if indexer_sd is not None:
        prefix = "" if any(k.startswith("input_layer") for k in indexer_sd) \
            else "indexer."
        _convert_indexer_into(t, indexer_sd, cfg.indexer, cfg.scale, prefix,
                              ("indexer",))
    return t.tree()


# ---------------------------------------------------------------------------
# GPEMSR stage-3 checkpoint (model/GPEMSR.py layout)
# ---------------------------------------------------------------------------

def _res_nobn(t: _Tree, sd, src, dst):
    """basicsr ResidualBlockNoBN: conv1/conv2."""
    t.conv(sd, f"{src}.conv1", dst + ("conv1",))
    t.conv(sd, f"{src}.conv2", dst + ("conv2",))


def _dcnpack(t: _Tree, sd, src, dst):
    """basicsr DCNv2Pack: conv_offset (3*G*K ch conv) + deform weight/bias."""
    t.conv(sd, f"{src}.conv_offset", dst + ("conv_offset",))
    t.put(dst + ("weight",), jnp.asarray(
        _np(sd[f"{src}.weight"]).transpose(2, 3, 1, 0).reshape(
            9, _np(sd[f"{src}.weight"]).shape[1], -1)))
    t.put(dst + ("bias",), vec(sd[f"{src}.bias"]))


def _convert_pod_into(t: _Tree, sd, src, dst):
    """POD alignment (GPEMSR.py:64-96). The SpyNet inside lives at the
    GPEMSR top level in our tree (converted separately)."""
    for i, (a, b) in enumerate([("flowdsconv0_1", "ds0_1"),
                                ("flowdsconv0_2", "ds0_2"),
                                ("flowdsconv1_1", "ds1_1"),
                                ("flowdsconv1_2", "ds1_2"),
                                ("flowdsconv2_1", "ds2_1"),
                                ("flowdsconv2_2", "ds2_2")]):
        t.conv(sd, f"{src}.{a}", dst + ("flow_pyramid", b))
    for lv in ("L3", "L2", "L1"):
        for suffix in ("offset_conv1", "offset_conv2", "offset_conv3"):
            key = f"{src}.{lv}_{suffix}"
            if f"{key}.weight" in sd:
                t.conv(sd, key, dst + (f"{lv}_{suffix}",))
        _dcnpack(t, sd, f"{src}.{lv}_dcnpack", dst + (f"{lv}_dcn",))
        if f"{src}.{lv}_fea_conv.weight" in sd:
            t.conv(sd, f"{src}.{lv}_fea_conv", dst + (f"{lv}_fea_conv",))
    t.conv(sd, f"{src}.cas_offset_conv1", dst + ("cas_offset_conv1",))
    t.conv(sd, f"{src}.cas_offset_conv2", dst + ("cas_offset_conv2",))
    _dcnpack(t, sd, f"{src}.cas_dcnpack", dst + ("cas_dcn",))


def _convert_threeda_into(t: _Tree, sd, src, dst, nframes=5):
    for name in ("temporal_attn1", "temporal_attn2", "feat_fusion",
                 "conv3D_fusion_1", "conv3D_fusion_2", "conv2D_fusion_3",
                 "spatial_attn1", "spatial_attn2", "spatial_attn3",
                 "spatial_attn4", "spatial_attn5", "spatial_attn_l1",
                 "spatial_attn_l2", "spatial_attn_l3", "spatial_attn_add1",
                 "spatial_attn_add2"):
        t.conv(sd, f"{src}.{name}", dst + (name,))
    for name in ("conv3D_1", "conv3D_2"):
        # Conv3d over frames, kernel 1x1x1: [N, N, 1, 1, 1] -> [N, N]
        w = _np(sd[f"{src}.{name}.weight"])[:, :, 0, 0, 0]
        t.put(dst + (f"{name}_w",), jnp.asarray(w))
        t.put(dst + (f"{name}_b",), vec(sd[f"{src}.{name}.bias"]))


def convert_gpemsr(sd, cfg) -> dict:
    """Full stage-3 GPEMSR checkpoint -> flax params tree.

    cfg: GPEMSRConfig (scale selects the 16to1/8to1 fusion layout)."""
    t = _Tree()
    t.conv(sd, "conv_first", ("conv_first",))
    for i in range(cfg.front_RBs):
        _res_nobn(t, sd, f"feature_extraction.{i}", (f"front_rb{i}",))
    # VGG slices -> conv names (only the relu1_2 stage is materialised)
    for name, idx in _VGG_CONV_IDX.items():
        key = f"vgg.slice1.{idx}"
        if int(name[4]) == 1 and f"{key}.weight" in sd:
            t.raw_conv(sd, key, ("vgg", name))
    for i in (1, 2, 3):
        t.conv(sd, f"refmaskconv{i}", (f"refmaskconv{i}",))
    levels = ("reffea_L2_conv1", "reffea_L3_conv1") + \
        (("reffea_L4_conv1",) if cfg.scale == 16 else ())
    for name in levels:
        t.convT(sd, name, (name,))
    n_fusion = 4 if cfg.scale == 16 else 3
    for i in range(1, n_fusion + 1):
        t.conv(sd, f"reffusionconv{i}", (f"reffusionconv{i}",))
        for j in range(cfg.ref_fusion_feat_RBs):
            _res_nobn(t, sd, f"fusion_fea_block{i}.{j}",
                      (f"fusion_fea_block{i}_{j}",))
    for i in range(1, n_fusion):
        t.conv(sd, f"down_fea_conv{i}", (f"down_fea_conv{i}",))
    t.conv(sd, "reduce_dim_conv", ("reduce_dim_conv",))
    # frozen prior (the encoder is unused by the SR forward — GPEMSR only
    # calls ref_extract — so its checkpoint weights are skipped, mirroring
    # the reference's strict=False load)
    _convert_decoder_into(t, sd, cfg.prior.decoder, "refmodel.decoder.",
                          ("refmodel", "decoder"))
    _convert_indexer_into(t, sd, cfg.prior.indexer, cfg.scale,
                          "refmodel.indexer.", ("refmodel", "indexer"))
    t.put(("refmodel", "codebook", "embedding"),
          vec(sd["refmodel.codebook.embedding.weight"]))
    # alignment pyramid + POD + SpyNet (ours hangs spynet off the top level)
    for name in ("fea_L2_conv1", "fea_L2_conv2", "fea_L3_conv1", "fea_L3_conv2"):
        t.conv(sd, name, (name,))
    _convert_pod_into(t, sd, "align_module", ("align",))
    spy_sd = {k[len("align_module.spynet."):]: v for k, v in sd.items()
              if k.startswith("align_module.spynet.")}
    spy_tree = convert_spynet(spy_sd)
    for lv, sub in spy_tree.items():
        for conv, p in sub.items():
            for leaf, arr in p.items():
                t.put(("spynet", lv, conv, leaf), arr)
    _convert_threeda_into(t, sd, "ThreeDA", ("fusion",), cfg.nframes)
    for i in range(cfg.back_RBs):
        _res_nobn(t, sd, f"recon_trunk.{i}", (f"back_rb{i}",))
    n_up = 4 if cfg.scale == 16 else 3
    for i in range(1, n_up + 1):
        t.conv(sd, f"upconv{i}", (f"upconv{i}",))
    t.conv(sd, "HRconv", ("HRconv",))
    t.conv(sd, "conv_last", ("conv_last",))
    return t.tree()


# ---------------------------------------------------------------------------
# SpyNet / VGG19
# ---------------------------------------------------------------------------

def convert_spynet(sd, dst=(), levels=6):
    """basicsr SpyNet: basic_module.{L}.basic_module.{2i}.weight, i in 0..4."""
    t = _Tree()
    for lv in range(levels):
        for i in range(5):
            t.raw_conv(sd, f"basic_module.{lv}.basic_module.{2 * i}",
                       dst + (f"basic_module{lv}", f"conv{i}"))
    return t.tree()


# ---------------------------------------------------------------------------
# Segmentation nets (superhuman.pt / MALA.pt, keys after stripping 'module.')
# ---------------------------------------------------------------------------

def _bn(t: _Tree, sd, src, dst):
    """torch BatchNorm3d -> flax BatchNorm params + batch_stats."""
    t.put(("params",) + dst + ("bn", "scale"), vec(sd[f"{src}.weight"]))
    t.put(("params",) + dst + ("bn", "bias"), vec(sd[f"{src}.bias"]))
    t.put(("batch_stats",) + dst + ("bn", "mean"), vec(sd[f"{src}.running_mean"]))
    t.put(("batch_stats",) + dst + ("bn", "var"), vec(sd[f"{src}.running_var"]))


def _c3(t: _Tree, sd, src, dst, bias=True):
    t.put(("params",) + dst + ("kernel",), conv3d_w(sd[f"{src}.weight"]))
    if bias and f"{src}.bias" in sd:
        t.put(("params",) + dst + ("bias",), vec(sd[f"{src}.bias"]))


def _res_pni(t: _Tree, sd, src, dst):
    """reference resBlock_pni layout (residual.py:10-31): block1=[conv,BN,ELU],
    block2=[conv,BN,ELU,conv], block3=BN."""
    _c3(t, sd, f"{src}.block1.0", dst + ("embed",), bias=False)
    _bn(t, sd, f"{src}.block1.1", dst + ("bn_embed",))
    _c3(t, sd, f"{src}.block2.0", dst + ("conv1",), bias=False)
    _bn(t, sd, f"{src}.block2.1", dst + ("bn1",))
    _c3(t, sd, f"{src}.block2.3", dst + ("conv2",), bias=False)
    _bn(t, sd, f"{src}.block3", dst + ("bn_out",))


def convert_superhuman(sd) -> dict:
    """UNet_PNI checkpoint (shipped config: bilinear upsample, add-merge,
    async BN) -> {'params': ..., 'batch_stats': ...} for UNetSuperhuman."""
    t = _Tree()
    _c3(t, sd, "embed_in.0", ("embed_in",))
    for i in range(4):
        _res_pni(t, sd, f"conv{i}", (f"down{i}",))
    _res_pni(t, sd, "center", ("center",))
    for i in range(4):
        # upN = Sequential(Upsample, Conv3d) ; catN = Sequential(BN, ELU)
        _c3(t, sd, f"up{i}.1", (f"up{i}", "conv"))
        _bn(t, sd, f"cat{i}.0", (f"merge_bn{i}",))
        _res_pni(t, sd, f"conv{i + 4}", (f"dec{i}",))
    _c3(t, sd, "embed_out.0", ("embed_out",))
    _c3(t, sd, "out_put.0", ("out",))
    return t.tree()


def convert_mala(sd) -> dict:
    """UNet3D_MALA checkpoint -> {'params': ...} for UNetMALA."""
    t = _Tree()
    for i in range(1, 19):
        _c3(t, sd, f"conv{i}", (f"conv{i}",))
    for i in range(1, 4):
        # grouped ConvTranspose3d weight [C, 1, 1, 3, 3] -> our (3, 3, C)
        w = _np(sd[f"dconv{i}.weight"])
        t.put(("params", f"dconv{i}", "kernel"),
              jnp.asarray(w[:, 0, 0].transpose(1, 2, 0)))
    return t.tree()


_VGG_CONV_IDX = {  # torchvision vgg19 .features indices per conv
    "conv1_1": 0, "conv1_2": 2,
    "conv2_1": 5, "conv2_2": 7,
    "conv3_1": 10, "conv3_2": 12, "conv3_3": 14, "conv3_4": 16,
    "conv4_1": 19, "conv4_2": 21, "conv4_3": 23, "conv4_4": 25,
    "conv5_1": 28, "conv5_2": 30, "conv5_3": 32, "conv5_4": 34,
}


def convert_vgg19(sd, max_layer="relu5_4", dst=(), prefix="features."):
    """torchvision vgg19 state_dict (features.N.weight) -> VGG19Features."""
    stage_of = {"relu1_2": 1, "relu2_2": 2, "relu3_4": 3, "relu4_4": 4,
                "relu5_4": 5}[max_layer]
    t = _Tree()
    for name, idx in _VGG_CONV_IDX.items():
        if int(name[4]) > stage_of:
            continue
        t.raw_conv(sd, f"{prefix}{idx}", dst + (name,))
    return t.tree()
