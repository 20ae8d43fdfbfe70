"""Squeeze-and-excitation blocks for the 3-D seg nets.

Capability parity with the reference's SE family
(inference_code/model/squeeze_excite.py and residual.py:46-151 —
`SELayer`, `SELayerCS`, `resBlock_seIso`, `resBlock_seAnisoDilation`).
Reachable from no shipped reference config (dead code there), implemented
for inventory completeness in NDHWC flax: the channel squeeze is a global
mean over (z, y, x) (one reduction the VPU fuses), the excitation MLP is a
pair of tiny matmuls, and the spatial branch of SELayerCS is the reference's
1-ch conv -> (1,8,8) maxpool -> conv -> trilinear upsample -> 1x1 conv chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class SELayer(nn.Module):
    """Channel squeeze-excitation (squeeze_excite.py SELayer): global avg
    pool -> Linear/BN/ELU -> Linear/BN/sigmoid -> channel gate."""
    channel: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):   # x: [B, Z, Y, X, C]
        y = jnp.mean(x, axis=(1, 2, 3))           # [B, C]
        y = nn.Dense(self.channel // self.reduction, name="fc1")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(y)
        y = jax.nn.elu(y)
        y = nn.Dense(self.channel, name="fc2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, None, :]


class SELayerCS(nn.Module):
    """Channel & spatial squeeze-excitation (squeeze_excite.py SELayerCS):
    the channel gate of SELayer plus a spatial gate computed at 1/8 y/x
    resolution; output x*y + x*z."""
    channel: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, Z, Y, X, C = x.shape
        y = jnp.mean(x, axis=(1, 2, 3))
        y = nn.Dense(self.channel // self.reduction, name="fc1")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(y)
        y = jax.nn.elu(y)
        y = nn.Dense(self.channel, name="fc2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(y)
        y = jax.nn.sigmoid(y)

        z = nn.Conv(1, (1, 1, 1), name="sc_in")(x)
        z = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="sc_bn1")(z)
        z = jax.nn.elu(z)
        z = nn.max_pool(z, (1, 8, 8), strides=(1, 8, 8))
        z = nn.Conv(1, (3, 3, 3), padding=1, name="sc_conv")(z)
        z = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="sc_bn2")(z)
        z = jax.nn.elu(z)
        # trilinear upsample back to (Z, Y, X) (align_corners=False)
        z = jax.image.resize(z, (B, Z, Y, X, 1), method="trilinear")
        z = nn.Conv(self.channel, (1, 1, 1), name="sc_out")(z)
        z = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="sc_bn3")(z)
        z = jax.nn.sigmoid(z)
        return x * y[:, None, None, None, :] + x * z


class ResBlockSEAnisoDilation(nn.Module):
    """residual.py:66-99 resBlock_seAnisoDilation: stacked (1,3,3) convs at
    dilations 1/2/4/8 summed into the residual, gated by SELayerCS."""
    out_planes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                name=name)(h)

        res = jax.nn.elu(bn(nn.Conv(self.out_planes, (3, 3, 3), padding=1,
                                    name="inconv")(x), "in_bn"))
        hs = []
        h = res
        for i, d in enumerate((1, 2, 4, 8)):
            h = bn(nn.Conv(self.out_planes, (1, 3, 3),
                           kernel_dilation=(1, d, d),
                           padding=((0, 0), (d, d), (d, d)),
                           name=f"block{i + 1}")(h if i == 0
                                                 else jax.nn.elu(h)),
                   f"bn{i + 1}")
            hs.append(h)
        out = res + sum(hs)
        out = SELayerCS(self.out_planes, name="se_cs")(out, train=train)
        return jax.nn.elu(out)
