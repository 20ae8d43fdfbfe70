"""UNETR: 3-D ViT-encoder U-Net for affinity prediction.

Capability parity with reference inference_code/model/unetr.py:22 (selectable
alternative seg model; no shipped config uses it). NDHWC flax: patch-embed ->
transformer stack (features tapped at depth/4 intervals) -> deconv decoder
with skip projections, sigmoid affinity head. Attention over the full patch
grid is a single batched MXU matmul pair per layer."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gpemsr_tpu.ops.conv3d import Conv3D


class TransformerBlock(nn.Module):
    dim: int
    heads: int = 8
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):                      # [B, N, D]
        h = nn.LayerNorm(name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(self.dim * self.mlp_ratio, name="fc1")(h)
        h = jax.nn.gelu(h)
        h = nn.Dense(self.dim, name="fc2")(h)
        return x + h


class _DeconvBlock(nn.Module):
    """(1,2,2) nearest upsample + 3x3x3 conv + instance-ish GroupNorm + relu."""
    features: int

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        x = Conv3D(self.features, (3, 3, 3), padding=((1, 1),) * 3,
                   name="conv")(x)
        x = nn.GroupNorm(num_groups=min(8, self.features), name="gn")(x)
        return jax.nn.relu(x)


class UNETR(nn.Module):
    """Input [B, D, H, W, 1] -> sigmoid affinities [B, D, H, W, out_planes].
    H, W must be divisible by patch (z patches are size 1: anisotropic EM)."""
    out_planes: int = 3
    embed_dim: int = 256
    depth: int = 8
    heads: int = 8
    patch: int = 16
    feat: int = 32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        p = self.patch
        gh, gw = H // p, W // p
        n = D * gh * gw

        # patch embedding: (1, p, p) conv stride (1, p, p)
        emb = Conv3D(self.embed_dim, (1, p, p), strides=(1, p, p),
                     padding="VALID", name="patch_embed")(x)               # [B, D, gh, gw, E]
        tokens = emb.reshape(B, n, self.embed_dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n, self.embed_dim))
        tokens = tokens + pos

        taps = []
        tap_every = max(1, self.depth // 4)
        for i in range(self.depth):
            tokens = TransformerBlock(self.embed_dim, self.heads,
                                      name=f"block{i}")(tokens)
            if (i + 1) % tap_every == 0:
                taps.append(tokens)
        z3, z6, z9, z12 = (taps + [tokens] * 4)[:4]

        def grid(t):
            return t.reshape(B, D, gh, gw, self.embed_dim)

        f = self.feat
        # decoder: progressively upsample the deepest tap, merging projections
        # of earlier taps (classic UNETR wiring, compacted)
        d = _DeconvBlock(f * 8, name="up12")(grid(z12))            # p/2
        s9 = _DeconvBlock(f * 8, name="skip9")(grid(z9))
        d = Conv3D(f * 8, (3, 3, 3), padding=((1, 1),) * 3, name="merge9")(
            jnp.concatenate([d, s9], axis=-1))
        d = _DeconvBlock(f * 4, name="up9")(jax.nn.relu(d))        # p/4
        s6 = _DeconvBlock(f * 8, name="skip6a")(grid(z6))
        s6 = _DeconvBlock(f * 4, name="skip6b")(s6)
        d = Conv3D(f * 4, (3, 3, 3), padding=((1, 1),) * 3, name="merge6")(
            jnp.concatenate([d, s6], axis=-1))
        d = _DeconvBlock(f * 2, name="up6")(jax.nn.relu(d))        # p/8
        s3 = _DeconvBlock(f * 8, name="skip3a")(grid(z3))
        s3 = _DeconvBlock(f * 4, name="skip3b")(s3)
        s3 = _DeconvBlock(f * 2, name="skip3c")(s3)
        d = Conv3D(f * 2, (3, 3, 3), padding=((1, 1),) * 3, name="merge3")(
            jnp.concatenate([d, s3], axis=-1))
        d = _DeconvBlock(f, name="up3")(jax.nn.relu(d))            # p/16 = 1x
        # image-resolution stem skip
        stem = Conv3D(f, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                      name="stem")(x)
        d = Conv3D(f, (3, 3, 3), padding=((1, 1),) * 3, name="merge0")(
            jnp.concatenate([d, jax.nn.relu(stem)], axis=-1))
        out = Conv3D(self.out_planes, (1, 1, 1), padding=((0, 0),) * 3,
                     name="head")(jax.nn.relu(d))
        return jax.nn.sigmoid(out)


class ViT3D(nn.Module):
    """Plain 3-D ViT token encoder (reference inference_code/model/vit_3d.py
    role): patch embed + transformer stack, returns token features."""
    embed_dim: int = 256
    depth: int = 6
    heads: int = 8
    patch: tuple[int, int, int] = (4, 16, 16)

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        pz, ph, pw = self.patch
        emb = nn.Conv(self.embed_dim, self.patch, strides=self.patch,
                      name="patch_embed")(x)
        n = emb.shape[1] * emb.shape[2] * emb.shape[3]
        tokens = emb.reshape(B, n, self.embed_dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n, self.embed_dim))
        tokens = tokens + pos
        for i in range(self.depth):
            tokens = TransformerBlock(self.embed_dim, self.heads,
                                      name=f"block{i}")(tokens)
        return nn.LayerNorm(name="ln")(tokens)


class MonaiViT(nn.Module):
    """The reference's third ViT wrapper (inference_code/model/monai_vit.py —
    a vendored MONAI ViT): patch embed + transformer stack, returning
    (output, all per-layer hidden states). With classification=True a cls
    token is prepended and the head is Linear(num_classes) with optional
    Tanh post-activation (monai_vit.py:103-109,117-120)."""
    embed_dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    patch: tuple[int, int, int] = (4, 16, 16)
    classification: bool = False
    num_classes: int = 2
    post_activation: str = "Tanh"

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        emb = nn.Conv(self.embed_dim, self.patch, strides=self.patch,
                      name="patch_embed")(x)
        n = emb.shape[1] * emb.shape[2] * emb.shape[3]
        tokens = emb.reshape(B, n, self.embed_dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n, self.embed_dim))
        tokens = tokens + pos
        if self.classification:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, self.embed_dim))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (B, 1, self.embed_dim)), tokens], 1)
        hidden_states = []
        for i in range(self.depth):
            tokens = TransformerBlock(self.embed_dim, self.heads,
                                      self.mlp_ratio, name=f"block{i}")(tokens)
            hidden_states.append(tokens)
        out = nn.LayerNorm(name="ln")(tokens)
        if self.classification:
            out = nn.Dense(self.num_classes, name="head")(out[:, 0])
            if self.post_activation == "Tanh":
                out = jnp.tanh(out)
        return out, hidden_states
