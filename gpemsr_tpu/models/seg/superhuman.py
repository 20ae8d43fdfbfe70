"""Superhuman anisotropic 3-D residual U-Net (Lee et al., arXiv:1706.00120).

Capability parity with reference inference_code/model/model_superhuman.py:10-170
(shipped config: filters [28,36,48,64,80], ELU, add-merge, bilinear upsample,
async BatchNorm). NDHWC layout; the anisotropic (1,k,k) convs batch the z-axis
into leading dims so the MXU sees large 2-D convs."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gpemsr_tpu.ops.conv3d import Conv3D
from gpemsr_tpu.ops.resize import resize_trilinear




class BNELU(nn.Module):
    """BatchNorm3d + ELU ('async' bn mode, momentum 0.001 in the reference).
    Running statistics load from converted checkpoints; `train` toggles
    use of batch statistics."""
    momentum: float = 0.001

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=1.0 - self.momentum, epsilon=1e-5,
                         name="bn")(x)
        return jax.nn.elu(x)


class ResBlockPNI(nn.Module):
    """Pre-act residual block (residual.py:10-31): (1,3,3) embed conv+BN+ELU,
    then 3x3x3 conv+BN+ELU + 3x3x3 conv, residual add, BN, ELU."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        r = Conv3D(f, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                   use_bias=False, name="embed")(x)
        r = BNELU(name="bn_embed")(r, train)
        h = Conv3D(f, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
                   name="conv1")(r)
        h = BNELU(name="bn1")(h, train)
        h = Conv3D(f, (3, 3, 3), padding=((1, 1),) * 3, use_bias=False,
                   name="conv2")(h)
        out = r + h
        out = BNELU(name="bn_out")(out, train)
        return out


class UpsampleBlock(nn.Module):
    """(1,2,2) trilinear upsample (align_corners=True) + 1x1x1 conv
    (basic.py:144-152, 'bilinear' mode of the shipped config)."""
    features: int

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        x = resize_trilinear(x, D, H * 2, W * 2, align_corners=True)
        return Conv3D(self.features, (1, 1, 1),
                      padding=((0, 0),) * 3, name="conv")(x)


class UNetSuperhuman(nn.Module):
    """in NDHWC [B, 18, 160, 160, 1] -> sigmoid affinities [B, 18, 160, 160, 3].

    The reference's unused variants (model_superhuman.py:173,335,495) are
    options rather than clones:
      * embedding_head > 0: the output head maps to an `emd`-dim embedding
        without sigmoid (UNet_PNI_embedding; `emd=16`).
      * deep_supervision: additionally return coarse heads on the center and
        the three intermediate decoder features (UNet_PNI_embedding_deep's
        (out1..out4, out) tuple, at 1/16..1/2 spatial resolution).
      * return_embedding: also return the pre-head `embed_out` feature
        (UNet_PNI_mask's (embed_out, out))."""
    filters: Sequence[int] = (28, 36, 48, 64, 80)
    out_planes: int = 3
    if_sigmoid: bool = True
    embedding_head: int = 0
    deep_supervision: bool = False
    return_embedding: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = list(self.filters)
        f2 = [f[0]] + f                      # [28, 28, 36, 48, 64, 80]

        h = Conv3D(f2[0], (1, 5, 5), padding=((0, 0), (2, 2), (2, 2)),
                   name="embed_in")(x)
        h = jax.nn.elu(h)

        skips = []
        for i in range(4):
            h = ResBlockPNI(f2[i + 1], name=f"down{i}")(h, train)
            skips.append(h)
            h = nn.max_pool(h, (1, 2, 2), strides=(1, 2, 2))

        h = ResBlockPNI(f2[5], name="center")(h, train)
        deep_feats = [h]

        for i in range(4):
            lvl = 3 - i
            h = UpsampleBlock(f2[lvl + 1], name=f"up{i}")(h)
            h = h + skips[lvl]                      # add-merge
            h = BNELU(name=f"merge_bn{i}")(h, train)
            h = ResBlockPNI(f2[lvl + 1], name=f"dec{i}")(h, train)
            if i < 3:
                deep_feats.append(h)

        h = Conv3D(f2[0], (1, 5, 5), padding=((0, 0), (2, 2), (2, 2)),
                   name="embed_out")(h)
        embed_out = jax.nn.elu(h)
        n_out = self.embedding_head or self.out_planes
        out = Conv3D(n_out, (1, 1, 1), padding=((0, 0),) * 3,
                     name="out")(embed_out)
        if self.if_sigmoid and not self.embedding_head:
            out = jax.nn.sigmoid(out)
        if self.deep_supervision:
            deep = [Conv3D(n_out, (1, 1, 1), padding=((0, 0),) * 3,
                           name=f"deep_out{i}")(d)
                    for i, d in enumerate(deep_feats)]
            return (*deep, out)
        if self.return_embedding:
            return embed_out, out
        return out
