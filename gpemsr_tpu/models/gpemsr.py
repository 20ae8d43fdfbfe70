"""GPEMSR multi-frame SR network: POD alignment, ThreeDA fusion, prior-feature
injection, PixelShuffle upsampling.

Capability parity with reference model/GPEMSR.py:64-456, re-architected for
TPU: NHWC everywhere, frames folded into the batch dim for all per-frame convs
(one big MXU batch instead of python loops), the 5-frame POD alignment runs as
a single batched computation over [B*N] with the center features broadcast."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gpemsr_tpu.core.config import GPEMSRConfig
from gpemsr_tpu.models.layers import (Conv, ConvTranspose2dTorch,
                                      ResidualBlockNoBN, SubpixelConvShuffle,
                                      lrelu)
from gpemsr_tpu.models.prior import LRGenerator
from gpemsr_tpu.models.spynet import SpyNet
from gpemsr_tpu.models.vgg import VGG19Features
from gpemsr_tpu.ops.dcn import deform_conv2d
from gpemsr_tpu.ops.resize import interpolate


class DCNPack(nn.Module):
    """basicsr DCNv2Pack: a conv on the offset features predicts (o1, o2, mask)
    chunks; offsets are the (o1|o2) concat reinterpreted as interleaved (dy,dx)
    pairs, mask is sigmoid-activated."""
    nf: int
    groups: int = 8
    dense_threshold: int = 1024
    window_radius: int = 0

    @nn.compact
    def __call__(self, x, feat):
        K = 9
        G = self.groups
        # zero-initialized like basicsr DCNv2Pack.init_offset (weight+bias=0):
        # the DCN starts as a plain 3x3 conv with mask sigmoid(0)=0.5, and
        # offsets grow from zero during training
        out = Conv(3 * G * K, name="conv_offset", zero_init=True)(feat)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = jax.nn.sigmoid(mask)
        w = self.param("weight", nn.initializers.variance_scaling(
            1 / 3, "fan_in", "uniform"), (K, x.shape[-1], self.nf))
        b = self.param("bias", nn.initializers.zeros, (self.nf,))
        return deform_conv2d(x, offset, mask, w, b, deformable_groups=G,
                             dense_threshold=self.dense_threshold,
                             window_radius=self.window_radius)


class PyramidFlowFeatures(nn.Module):
    """Strided-conv pyramid of SpyNet flow features (GPEMSR.py:70-75,101-106).

    Two independent stacks (the reference computes the same flow twice through
    two conv chains — kept for weight parity)."""
    @nn.compact
    def __call__(self, flow1, flow2):
        f1_l1 = Conv(16, stride=4, pad=1, name="ds0_1")(flow1)
        f2_l1 = Conv(16, stride=4, pad=1, name="ds0_2")(flow2)
        f1_l2 = Conv(16, stride=2, name="ds1_1")(f1_l1)
        f2_l2 = Conv(16, stride=2, name="ds1_2")(f2_l1)
        f1_l3 = Conv(16, stride=2, name="ds2_1")(f1_l2)
        f2_l3 = Conv(16, stride=2, name="ds2_2")(f2_l2)
        return (f1_l1, f2_l1), (f1_l2, f2_l2), (f1_l3, f2_l3)


class POD(nn.Module):
    """Pyramid Offset + flow-guided Deformable alignment (GPEMSR.py:64-140).

    Aligns neighbour features to the center frame coarse-to-fine over 3 levels,
    with SpyNet flow guidance and a cascading refinement DCN. Operates on
    batched [B*N] neighbour tensors at once (the reference loops frames in
    Python; we broadcast the reference features instead)."""
    nf: int = 64
    groups: int = 8
    dense_threshold: int = 1024
    window_radius: int = 0
    # cascade refinement sees pre-aligned features -> small offsets; a
    # trained-checkpoint radius probe measured (2, 2) vs (4, 4) at L1
    # (core/config.py::dcn_cascade_window_radius)
    cascade_window_radius: int = 0
    # L3/L2 likewise probe at (2, 2) (core/config.py::dcn_coarse_window_radius)
    coarse_window_radius: int = 0

    def _dcn(self, name, radius=None):
        return DCNPack(self.nf, self.groups, name=name,
                       dense_threshold=self.dense_threshold,
                       window_radius=(self.window_radius if radius is None
                                      else radius))

    @nn.compact
    def __call__(self, nbr_fea_l, ref_fea_l, nbr_frame, ref_frame, spynet: SpyNet):
        # flows on 4x-bilinear-upsampled frames (GPEMSR.py:99-100); the
        # reference calls spynet twice with identical args — one call + two
        # conv stacks is numerically identical and half the FLOPs
        up_nbr = interpolate(nbr_frame, 4.0)
        up_ref = interpolate(ref_frame, 4.0)
        flow = jax.lax.stop_gradient(spynet(up_nbr, up_ref))
        (f1_l1, f2_l1), (f1_l2, f2_l2), (f1_l3, f2_l3) = \
            PyramidFlowFeatures(name="flow_pyramid")(flow, flow)

        nbr_l2 = interpolate(nbr_frame, 0.5)
        ref_l2 = interpolate(ref_frame, 0.5)
        nbr_l3 = interpolate(nbr_l2, 0.5)
        ref_l3 = interpolate(ref_l2, 0.5)

        # L3 (coarsest)
        l3_in = jnp.concatenate(
            [nbr_fea_l[2], ref_fea_l[2], f1_l3, f2_l3, nbr_l3, ref_l3], axis=-1)
        l3_off = lrelu(Conv(self.nf, name="L3_offset_conv1")(l3_in))
        l3_off = lrelu(Conv(self.nf, name="L3_offset_conv2")(l3_off))
        l3_fea = lrelu(self._dcn("L3_dcn", radius=self.coarse_window_radius)(
            nbr_fea_l[2], l3_off))

        # L2
        l2_in = jnp.concatenate(
            [nbr_fea_l[1], ref_fea_l[1], f1_l2, f2_l2, nbr_l2, ref_l2], axis=-1)
        l2_off = lrelu(Conv(self.nf, name="L2_offset_conv1")(l2_in))
        l3_off_up = interpolate(l3_off, 2.0)
        l2_off = lrelu(Conv(self.nf, name="L2_offset_conv2")(
            jnp.concatenate([l2_off, l3_off_up * 2], axis=-1)))
        l2_off = lrelu(Conv(self.nf, name="L2_offset_conv3")(l2_off))
        l2_fea = self._dcn("L2_dcn",
                           radius=self.coarse_window_radius)(nbr_fea_l[1], l2_off)
        l3_fea_up = interpolate(l3_fea, 2.0)
        l2_fea = lrelu(Conv(self.nf, name="L2_fea_conv")(
            jnp.concatenate([l2_fea, l3_fea_up], axis=-1)))

        # L1 (finest)
        l1_in = jnp.concatenate(
            [nbr_fea_l[0], ref_fea_l[0], f1_l1, f2_l1, nbr_frame, ref_frame], axis=-1)
        l1_off = lrelu(Conv(self.nf, name="L1_offset_conv1")(l1_in))
        l2_off_up = interpolate(l2_off, 2.0)
        l1_off = lrelu(Conv(self.nf, name="L1_offset_conv2")(
            jnp.concatenate([l1_off, l2_off_up * 2], axis=-1)))
        l1_off = lrelu(Conv(self.nf, name="L1_offset_conv3")(l1_off))
        l1_fea = self._dcn("L1_dcn")(nbr_fea_l[0], l1_off)
        l2_fea_up = interpolate(l2_fea, 2.0)
        l1_fea = Conv(self.nf, name="L1_fea_conv")(
            jnp.concatenate([l1_fea, l2_fea_up], axis=-1))

        # cascading refinement
        cas = jnp.concatenate([l1_fea, ref_fea_l[0]], axis=-1)
        cas = lrelu(Conv(self.nf, name="cas_offset_conv1")(cas))
        cas = lrelu(Conv(self.nf, name="cas_offset_conv2")(cas))
        return lrelu(self._dcn("cas_dcn",
                               radius=self.cascade_window_radius)(l1_fea, cas))


class ThreeDA(nn.Module):
    """Temporal-spatial attention fusion (GPEMSR.py:143-222): per-frame
    correlation with center embedding, 1x1x1 Conv3d cross-frame mixing, and a
    2-level pooled spatial attention pyramid."""
    nf: int = 64
    nframes: int = 5
    center: int = 2

    @nn.compact
    def __call__(self, aligned):  # [B, N, H, W, C]
        B, N, H, W, C = aligned.shape
        emb_ref = Conv(self.nf, name="temporal_attn1")(aligned[:, self.center])
        emb = Conv(self.nf, name="temporal_attn2")(
            aligned.reshape(B * N, H, W, C)).reshape(B, N, H, W, C)
        corr = jnp.sum(emb * emb_ref[:, None], axis=-1)        # [B, N, H, W]
        prob = jax.nn.sigmoid(corr)[..., None]                 # [B, N, H, W, 1]
        feat_w = aligned * prob

        # frames-as-channels layout: [B, H, W, N*C]
        flat = feat_w.transpose(0, 2, 3, 1, 4).reshape(B, H, W, N * C)
        feat = lrelu(Conv(self.nf, kernel=1, pad=0, name="feat_fusion")(flat))

        def conv3d_frames(x, name):
            # 1x1x1 Conv3d over the frame axis == per-pixel frame mixing:
            # one [N, N] matmul on the frame dim (GPEMSR.py:150-151)
            w = self.param(f"{name}_w", nn.initializers.variance_scaling(
                1 / 3, "fan_in", "uniform"), (N, N))
            b = self.param(f"{name}_b", nn.initializers.zeros, (N,))
            y = jnp.einsum("bnhwc,mn->bmhwc", x, w) + b[None, :, None, None, None]
            return y

        f3d1 = lrelu(conv3d_frames(feat_w, "conv3D_1"))
        f3d1 = lrelu(Conv(self.nf, kernel=1, pad=0, name="conv3D_fusion_1")(
            f3d1.transpose(0, 2, 3, 1, 4).reshape(B, H, W, N * C)))
        f3d2 = lrelu(conv3d_frames(feat_w, "conv3D_2"))
        f3d2 = lrelu(Conv(self.nf, kernel=1, pad=0, name="conv3D_fusion_2")(
            f3d2.transpose(0, 2, 3, 1, 4).reshape(B, H, W, N * C)))

        feat = feat + f3d1
        f3d3 = Conv(self.nf, kernel=1, pad=0, name="conv2D_fusion_3")(feat)

        # spatial attention pyramid
        attn = lrelu(Conv(self.nf, kernel=1, pad=0, name="spatial_attn1")(flat))
        amax = nn.max_pool(attn, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        aavg = nn.avg_pool(attn, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                           count_include_pad=True)
        attn = lrelu(Conv(self.nf, kernel=1, pad=0, name="spatial_attn2")(
            jnp.concatenate([amax, aavg], axis=-1)))
        attn_lv = lrelu(Conv(self.nf, kernel=1, pad=0, name="spatial_attn_l1")(attn))
        amax = nn.max_pool(attn_lv, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        aavg = nn.avg_pool(attn_lv, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                           count_include_pad=True)
        attn_lv = lrelu(Conv(self.nf, name="spatial_attn_l2")(
            jnp.concatenate([amax, aavg], axis=-1)))
        attn_lv = lrelu(Conv(self.nf, name="spatial_attn_l3")(attn_lv))
        attn_lv = interpolate(attn_lv, 2.0)

        attn = lrelu(Conv(self.nf, name="spatial_attn3")(attn)) + attn_lv
        attn = lrelu(Conv(self.nf, kernel=1, pad=0, name="spatial_attn4")(attn))
        attn = interpolate(attn, 2.0)
        attn = Conv(self.nf, name="spatial_attn5")(attn)
        attn_add = Conv(self.nf, kernel=1, pad=0, name="spatial_attn_add2")(
            lrelu(Conv(self.nf, kernel=1, pad=0, name="spatial_attn_add1")(attn)))
        attn = jax.nn.sigmoid(attn)

        return feat * attn * 2 + attn_add + f3d2 + f3d3


class GPEMSR(nn.Module):
    """Full multi-frame SR network (GPEMSR.py:225-456). Input NHWC frames
    [B, N, H, W, 1]; returns (SR [B, H*s, W*s, 1], ref_imgs [B, N, H*s, W*s, 1])."""
    cfg: GPEMSRConfig

    def setup(self):
        c = self.cfg
        self.spynet = SpyNet()
        if c.w_ref:
            self.refmodel = LRGenerator(c.prior)
            self.vgg = VGG19Features(max_layer="relu1_2")
        self.align = POD(nf=c.nf, groups=c.groups,
                 dense_threshold=c.dcn_dense_threshold,
                 window_radius=c.dcn_window_radius,
                 cascade_window_radius=c.dcn_cascade_window_radius,
                 coarse_window_radius=c.dcn_coarse_window_radius)
        self.fusion = ThreeDA(nf=c.nf, nframes=c.nframes, center=c.nframes // 2)

    @nn.compact
    def __call__(self, x, features_only: bool = False, frame_feats=None):
        """x: [B, N, H, W, 1] frames.

        Standard call: full SR forward. Two extra modes support streaming
        z-stack inference (consecutive windows share N-1 frames, and every
        per-frame computation — front trunk, prior bank, VGG mask, fusion,
        alignment pyramid — can be computed once per SLICE and reused across
        the windows it appears in; the reference recomputes them per window):
          * features_only=True: return the per-frame feature pyramid
            (l1, l2, l3, ref_img), each [B, N, ...].
          * frame_feats=(l1, l2, l3, ref_img): skip per-frame work and run
            only the window-level alignment/fusion/reconstruction."""
        c = self.cfg
        B, N, H, W, C = x.shape
        nf = c.nf
        center = N // 2
        x_center = x[:, center]
        xf = x.reshape(B * N, H, W, C)

        if frame_feats is None:
            # per-frame feature extraction
            l1 = lrelu(Conv(nf, name="conv_first")(xf))
            for i in range(c.front_RBs):
                l1 = ResidualBlockNoBN(nf, name=f"front_rb{i}")(l1)

            ref_img = None
            if c.w_ref:
                l1, ref_img = self._prior_fusion(l1, xf, B, N, H, W)

            # alignment pyramid on fused features
            l2 = lrelu(Conv(nf, stride=2, name="fea_L2_conv1")(l1))
            l2 = lrelu(Conv(nf, name="fea_L2_conv2")(l2))
            l3 = lrelu(Conv(nf, stride=2, name="fea_L3_conv1")(l2))
            l3 = lrelu(Conv(nf, name="fea_L3_conv2")(l3))
            if features_only:
                s = c.scale
                return (l1.reshape(B, N, H, W, nf),
                        l2.reshape(B, N, H // 2, W // 2, nf),
                        l3.reshape(B, N, H // 4, W // 4, nf),
                        None if ref_img is None else
                        ref_img.reshape(B, N, H * s, W * s, C))
        else:
            l1, l2, l3, ref_img = frame_feats
            l1 = l1.reshape(B * N, H, W, nf)
            l2 = l2.reshape(B * N, H // 2, W // 2, nf)
            l3 = l3.reshape(B * N, H // 4, W // 4, nf)
            if ref_img is not None:
                ref_img = ref_img.reshape(B * N, H * c.scale, W * c.scale, C)

        def split_center(t, h, w):
            t = t.reshape(B, N, h, w, nf)
            ref = t[:, center]
            # broadcast center to every frame and fold frames into batch
            ref_b = jnp.broadcast_to(ref[:, None], t.shape).reshape(B * N, h, w, nf)
            return t.reshape(B * N, h, w, nf), ref_b

        n1, r1 = split_center(l1, H, W)
        n2, r2 = split_center(l2, H // 2, W // 2)
        n3, r3 = split_center(l3, H // 4, W // 4)
        frames = xf
        center_b = jnp.broadcast_to(
            x_center[:, None], (B, N, H, W, C)).reshape(B * N, H, W, C)

        aligned = self.align([n1, n2, n3], [r1, r2, r3], frames, center_b,
                             self.spynet)
        aligned = aligned.reshape(B, N, H, W, nf)

        fea = self.fusion(aligned)

        out = fea
        for i in range(c.back_RBs):
            out = ResidualBlockNoBN(nf, name=f"back_rb{i}")(out)

        # upconv1: nf -> nf*4 (shuffles back to nf); later stages work at 64ch
        # (GPEMSR.py:304-318). SubpixelConvShuffle = conv + pixel_shuffle with
        # the torch channel packing moved into the weights so the
        # depth-to-space never crosses the lane dim (checkpoint-identical).
        n_up = 4 if c.scale == 16 else 3
        for i in range(n_up):
            feats = nf * 4 if i == 0 else 64 * 4
            out = lrelu(
                SubpixelConvShuffle(feats, name=f"upconv{i + 1}")(out))
        out = lrelu(Conv(64, name="HRconv")(out))
        out = Conv(1, name="conv_last")(out)

        base = interpolate(x_center, float(c.scale))
        out = out + base
        if ref_img is not None:
            ref_img = ref_img.reshape(B, N, H * c.scale, W * c.scale, C)
        return out, ref_img

    def _prior_fusion(self, l1, xf, B, N, H, W):
        """Prior-feature pyramid fusion with VGG patch-similarity mask
        (GPEMSR.py:333-415). scale=16 path has 4 fusion levels, scale=8 has 3."""
        c = self.cfg
        nf = c.nf
        s = c.scale

        # upsampled feature pyramid from the LR features
        l2 = lrelu(ConvTranspose2dTorch(nf, name="reffea_L2_conv1")(l1))
        l3 = lrelu(ConvTranspose2dTorch(nf, name="reffea_L3_conv1")(l2))
        if s == 16:
            l4 = lrelu(ConvTranspose2dTorch(nf, name="reffea_L4_conv1")(l3))

        # frozen prior feature bank
        bank = self.refmodel.ref_extract(xf)
        bank = [jax.lax.stop_gradient(t) for t in bank]
        ref_x16, ref_x8, ref_x4, ref_x2, ref_img = bank

        # VGG patch-similarity confidence mask. The reference unfolds 16x16
        # patches of relu1_2 and takes normalized dot products
        # (GPEMSR.py:345-358) — materialising a [B*N, 64*256, L] tensor. The
        # per-patch cosine is exactly expressible with 16x16 sum-pools of
        # (a*b, a*a, b*b): identical numerics, none of the unfold traffic.
        # On TPU the conv1_2 + products + pools further fuse into one Pallas
        # kernel (ops/vggmask_pallas.py) that never writes relu1_2 to HBM.
        up_lr = interpolate(xf, float(s))
        from gpemsr_tpu.ops import vggmask_pallas
        Hs, Ws = ref_img.shape[1:3]
        if not self.is_initializing() and vggmask_pallas.supported(Hs, Ws):
            vp = self.vgg.variables["params"]
            sim = vggmask_pallas.vgg_patch_cosine(
                ref_img, up_lr,
                vp["conv1_1"]["kernel"], vp["conv1_1"]["bias"],
                vp["conv1_2"]["kernel"], vp["conv1_2"]["bias"])
            # nothing trainable feeds the mask inputs (bank is
            # stop_gradient'ed above; up_lr is data) — keep that explicit,
            # the kernel defines no VJP
            sim = jax.lax.stop_gradient(sim).astype(xf.dtype)
        else:
            vgg_ref = self.vgg(jnp.broadcast_to(
                ref_img, ref_img.shape[:-1] + (3,)))["relu1_2"]
            vgg_lr = self.vgg(jnp.broadcast_to(
                up_lr, up_lr.shape[:-1] + (3,)))["relu1_2"]

            def patch_sums(t):
                p = nn.avg_pool(t, (16, 16), strides=(16, 16))
                return jnp.sum(p, axis=-1) * 256.0           # [B*N, gh, gw]

            dot = patch_sums(vgg_ref * vgg_lr)
            na = jnp.sqrt(patch_sums(vgg_ref * vgg_ref))
            nb = jnp.sqrt(patch_sums(vgg_lr * vgg_lr))
            sim = dot / (na * nb + 1e-12)
        mh, mw = (H, W) if s == 16 else (H // 2, W // 2)
        mask = sim.reshape(B * N, mh, mw, 1)
        mask = lrelu(Conv(nf, name="refmaskconv1")(mask))
        mask = lrelu(Conv(nf, name="refmaskconv2")(mask))
        mask = lrelu(Conv(1, name="refmaskconv3")(mask))
        mask = jax.nn.sigmoid(mask)

        def fuse(level_feat, prior_feat, extra, idx, mask_scale):
            inp = [level_feat, prior_feat] + ([extra] if extra is not None else [])
            h = Conv(nf, name=f"reffusionconv{idx}")(jnp.concatenate(inp, axis=-1))
            for j in range(c.ref_fusion_feat_RBs):
                h = ResidualBlockNoBN(nf, name=f"fusion_fea_block{idx}_{j}")(h)
            m = mask if mask_scale == 1 else interpolate(mask, float(mask_scale))
            return h * m

        if s == 16:
            r2 = fuse(l4, ref_x2, None, 1, 8)
            r2 = Conv(nf, stride=2, name="down_fea_conv1")(r2)
            r4 = fuse(l3, ref_x4, r2, 2, 4)
            r4 = Conv(nf * 2, stride=2, name="down_fea_conv2")(
                jnp.concatenate([r4, r2], axis=-1))
            r8 = fuse(l2, ref_x8, r4, 3, 2)
            r8 = Conv(nf * 3, stride=2, name="down_fea_conv3")(
                jnp.concatenate([r8, r4], axis=-1))
            r16 = fuse(l1, ref_x16, r8, 4, 1)
            fused = jnp.concatenate([r16, r8, l1], axis=-1)   # 5*nf
        else:
            r2 = fuse(l3, ref_x2, None, 1, 8)
            r2 = Conv(nf, stride=2, name="down_fea_conv1")(r2)
            r4 = fuse(l2, ref_x4, r2, 2, 4)
            r4 = Conv(nf * 2, stride=2, name="down_fea_conv2")(
                jnp.concatenate([r4, r2], axis=-1))
            r8 = fuse(l1, ref_x8, r4, 3, 2)
            fused = jnp.concatenate([r8, r4, l1], axis=-1)    # 4*nf
        out = Conv(nf, kernel=1, pad=0, name="reduce_dim_conv")(fused)
        return out, ref_img
