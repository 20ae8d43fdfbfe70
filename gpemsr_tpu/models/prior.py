"""Generative prior: VQGAN encoder/decoder/codebook, LR Indexer, PatchGAN
discriminator, and the composite generators.

Capability parity with reference model/{blocks,encoder,decoder,codebook,
indexer,discriminator,vqgan,vqgan_indexer}.py, re-expressed as NHWC flax
modules. All convs are large-channel 3x3s that XLA maps straight onto the MXU;
the NonLocal attention and codebook search are single batched matmuls."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gpemsr_tpu.core.config import (
    CodebookConfig, DecoderConfig, DiscriminatorConfig, EncoderConfig,
    IndexerConfig, PriorConfig,
)
from gpemsr_tpu.models.layers import Conv, ConvTranspose2dTorch, GroupNorm32, instance_norm
from gpemsr_tpu.ops.vq import lookup_logits, quantize


class ResidualBlock(nn.Module):
    """GroupNorm(32) pre-skip residual block (blocks.py:8-29); 1x1 projection
    when channel count changes."""
    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = Conv(self.out_ch, name="conv1")(x)
        h = GroupNorm32(name="norm1")(h)
        h = jax.nn.relu(h)
        h = Conv(self.out_ch, name="conv2")(h)
        h = GroupNorm32(name="norm2")(h)
        h = jax.nn.relu(h)
        if self.in_ch != self.out_ch:
            x = Conv(self.out_ch, kernel=1, pad=0, name="channel_up")(x)
        return x + h


class DownBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        return Conv(self.out_ch, stride=2, name="down")(x)


class UpBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        return ConvTranspose2dTorch(self.out_ch, name="up")(x)


class NonLocalBlock(nn.Module):
    """Single-head self-attention over the latent grid (blocks.py:50-83).
    At the 32x32 latent of a 512 HR patch this is a [1024,1024] attention —
    one MXU matmul pair."""
    channels: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm32(name="gn")(x)
        q = Conv(C, kernel=1, pad=0, name="q")(h).reshape(B, H * W, C)
        k = Conv(C, kernel=1, pad=0, name="k")(h).reshape(B, H * W, C)
        v = Conv(C, kernel=1, pad=0, name="v")(h).reshape(B, H * W, C)
        attn = jnp.einsum("bic,bjc->bij", q, k,
                          preferred_element_type=jnp.float32) * (C ** -0.5)
        attn = jax.nn.softmax(attn, axis=2)
        out = jnp.einsum("bij,bjc->bic", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(B, H, W, C)
        out = Conv(C, kernel=1, pad=0, name="proj_out")(out)
        return x + out


class Encoder(nn.Module):
    """HR patch -> latent (encoder.py:5-40): stem, per-scale resblocks +
    stride-2 downsample (4x -> 16x reduction), NonLocal, output resblocks."""
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        ch = list(c.channel_list)
        h = Conv(ch[0], name="stem")(x)
        h = jax.nn.relu(h)
        for i in range(len(ch) - 1):
            for j in range(c.num_resblock_per_scale):
                h = ResidualBlock(ch[i], ch[i], name=f"res{i}_{j}")(h)
            h = DownBlock(ch[i + 1], name=f"down{i}")(h)
        if c.use_non_local:
            h = NonLocalBlock(ch[-1], name="nonlocal")(h)
        for j in range(c.num_output_resblck):
            h = ResidualBlock(ch[-1], ch[-1], name=f"out_res{j}")(h)
        return Conv(c.latent_dim, kernel=1, pad=0, name="to_latent")(h)


class Decoder(nn.Module):
    """Latent -> image, mirror of the encoder (decoder.py:6-57).

    `multi_scale` mode returns the generative-prior feature bank: the feature
    after each scale's resblock stack *before* its upsample
    (decoder.py:40-57) plus the decoded image — consumed by GPEMSR."""
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, z, multi_scale: bool = False):
        c = self.cfg
        ch = list(c.channel_list)
        h = Conv(ch[0], kernel=1, pad=0, name="from_latent")(z)
        for j in range(c.num_input_resblck):
            h = ResidualBlock(ch[0], ch[0], name=f"in_res{j}")(h)
        if c.use_non_local:
            h = NonLocalBlock(ch[0], name="nonlocal")(h)
        feats = []
        for i in range(len(ch) - 1):
            for j in range(c.num_resblock_per_scale):
                h = ResidualBlock(ch[i], ch[i], name=f"res{i}_{j}")(h)
            feats.append(h)
            h = UpBlock(ch[i + 1], name=f"up{i}")(h)
        img = Conv(c.im_channel, name="to_img")(h)
        if multi_scale:
            return feats + [img]
        return img


class Codebook(nn.Module):
    """VQ codebook (codebook.py:5-43). The embedding table is a parameter;
    quantization itself lives in ops.vq (MXU distance matmul)."""
    cfg: CodebookConfig

    def setup(self):
        c = self.cfg

        def init(key, shape, dtype=jnp.float32):
            # torch: embedding.weight.data.uniform_(-1/V, 1/V) (codebook.py:13)
            lim = 1.0 / c.num_codebook_vectors
            return jax.random.uniform(key, shape, dtype, -lim, lim)

        self.embedding = self.param(
            "embedding", init, (c.num_codebook_vectors, c.latent_dim))

    def __call__(self, z):
        return quantize(z, self.embedding, self.cfg.beta)

    def inference_lr(self, logits):
        return lookup_logits(logits, self.embedding)


class Indexer(nn.Module):
    """LR -> per-pixel codebook logits (indexer.py:6-102).

    scale=16: channel transitions via residual blocks, latent grid == LR grid.
    scale=8: one stride-2 downsample at the final transition (indexer.py:79),
    halving the LR grid to the latent grid."""
    cfg: IndexerConfig
    scale: int = 16

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        ch = list(c.channel_list)
        h = Conv(ch[0], name="stem")(x)
        h = jax.nn.relu(h)
        n_trans = len(ch) - 1
        for i in range(n_trans):
            for j in range(c.num_resblock_per_scale - 1):
                h = ResidualBlock(ch[i], ch[i], name=f"res{i}_{j}")(h)
            # x8 downsamples at the last transition; x16 never does
            if self.scale == 8 and i == n_trans - 1:
                h = DownBlock(ch[i + 1], name=f"down{i}")(h)
            else:
                h = ResidualBlock(ch[i], ch[i + 1], name=f"trans{i}")(h)
        if c.use_non_local:
            h = NonLocalBlock(ch[-1], name="nonlocal")(h)
        for j in range(c.num_output_resblck):
            h = ResidualBlock(ch[-1], ch[-1], name=f"out_res{j}")(h)
        h = Conv(c.latent_dim, kernel=1, pad=0, name="to_latent")(h)
        logits = nn.Dense(c.num_classes, name="classify")(h)
        return logits  # [B, H, W, num_classes]


class Discriminator(nn.Module):
    """PatchGAN with InstanceNorm and VALID (pad 0) 4x4 convs
    (discriminator.py:9-32)."""
    cfg: DiscriminatorConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        nfl = c.num_filters_last
        # VALID 4x4 convs: anything smaller than the receptive minimum yields
        # an empty patch map and silently-NaN GAN losses
        need = 4 + 3                      # head + final stride-1 conv
        for _ in range(c.n_layers):       # stride-2 convs incl. conv0
            need = 2 * need + 2
        if min(x.shape[1], x.shape[2]) < need:
            raise ValueError(
                f"Discriminator needs inputs >= {need}px, got {x.shape}")
        h = nn.Conv(nfl, (4, 4), strides=(2, 2), padding="VALID", name="conv0")(x)
        h = jax.nn.leaky_relu(h, 0.2)
        mult = 1
        for i in range(1, c.n_layers + 1):
            mult = min(2 ** i, 8)
            stride = 2 if i < c.n_layers else 1
            h = nn.Conv(nfl * mult, (4, 4), strides=(stride, stride),
                        padding="VALID", use_bias=False, name=f"conv{i}")(h)
            h = instance_norm(h)
            h = jax.nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding="VALID", name="head")(h)


class VQGANGenerator(nn.Module):
    """Stage-1 composite: encoder -> codebook -> decoder (vqgan.py:17-27)."""
    cfg: PriorConfig

    def setup(self):
        self.encoder = Encoder(self.cfg.encoder)
        self.decoder = Decoder(self.cfg.decoder)
        self.codebook = Codebook(self.cfg.codebook)

    def __call__(self, imgs):
        z = self.encoder(imgs)
        z_q, idx, q_loss = self.codebook(z)
        dec = self.decoder(z_q)
        return dec, idx, q_loss


class LRGenerator(nn.Module):
    """Stage-2/3 composite: Indexer + frozen VQGAN (vqgan_indexer.py:20-48)."""
    cfg: PriorConfig

    def setup(self):
        self.indexer = Indexer(self.cfg.indexer, scale=self.cfg.scale)
        self.encoder = Encoder(self.cfg.encoder)
        self.decoder = Decoder(self.cfg.decoder)
        self.codebook = Codebook(self.cfg.codebook)

    def __call__(self, lr, gt):
        """Training pair: (flattened logits, gt codebook indices) for CE."""
        logits = self.indexer(lr)
        z = self.encoder(gt)
        _, gt_idx, _ = self.codebook(z)
        B, H, W, V = logits.shape
        return logits.reshape(B * H * W, V), gt_idx

    def output_ref(self, lr):
        """LR -> decoded prior reference image."""
        logits = self.indexer(lr)
        z_q = self.codebook.inference_lr(logits)
        return self.decoder(z_q)

    def ref_extract(self, lr):
        """LR -> 5-tuple multi-scale prior feature bank
        [512@1x, 256@2x, 128@4x, 64@8x, img@16x of latent grid]."""
        logits = self.indexer(lr)
        z_q = self.codebook.inference_lr(logits)
        return self.decoder(z_q, multi_scale=True)

    def init_all(self, lr, gt):
        """Touches every submodule so a single `init` creates all params."""
        out = self(lr, gt)
        self.ref_extract(lr)
        return out
