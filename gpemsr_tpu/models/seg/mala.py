"""MALA valid-convolution 3-D U-Net (reference inference_code/model/unet3d_mala.py:12-111).

Valid (unpadded) 3x3x3 convs, (1,3,3) max pools, grouped (depthwise)
(1,3,3)-stride-(1,3,3) transpose-conv upsampling, crop-and-add skips,
LeakyReLU(0.005). Input [B, 53, 268, 268, 1] -> output [B, 25, 56, 56, 3].
NDHWC layout."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gpemsr_tpu.ops.conv3d import Conv3D


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.005)


class DepthwiseUp(nn.Module):
    """Grouped ConvTranspose3d((1,3,3), stride (1,3,3), groups=C, no bias):
    each channel is upsampled by its own 3x3 kernel. Since stride == kernel,
    this is exactly a per-channel 'broadcast into 3x3 block' — a pixel-shuffle
    style reshape multiplied by the kernel, no real conv needed."""
    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        k = self.param("kernel", nn.initializers.normal(0.05), (3, 3, C))
        # out[b,d,3h+i,3w+j,c] = x[b,d,h,w,c] * k[i,j,c]
        y = x[:, :, :, None, :, None, :] * k[None, None, None, :, None, :, :]
        return y.reshape(B, D, H * 3, W * 3, C)


def _crop_add(up, skip):
    """Center-crop `skip` spatially to `up` and add (unet3d_mala.py:70-77)."""
    dz = (skip.shape[1] - up.shape[1]) // 2
    dy = (skip.shape[2] - up.shape[2]) // 2
    dx = (skip.shape[3] - up.shape[3]) // 2
    sk = skip[:, dz:dz + up.shape[1], dy:dy + up.shape[2], dx:dx + up.shape[3]]
    return up + sk


class UNetMALA(nn.Module):
    out_planes: int = 3
    if_sigmoid: bool = True

    @nn.compact
    def __call__(self, x):
        def conv(h, f, name, kernel=(3, 3, 3)):
            return Conv3D(f, kernel, padding="VALID", name=name)(h)

        c1 = _lrelu(conv(x, 12, "conv1"))
        c2 = _lrelu(conv(c1, 12, "conv2"))
        p1 = nn.max_pool(c2, (1, 3, 3), strides=(1, 3, 3))
        c3 = _lrelu(conv(p1, 60, "conv3"))
        c4 = _lrelu(conv(c3, 60, "conv4"))
        p2 = nn.max_pool(c4, (1, 3, 3), strides=(1, 3, 3))
        c5 = _lrelu(conv(p2, 300, "conv5"))
        c6 = _lrelu(conv(c5, 300, "conv6"))
        p3 = nn.max_pool(c6, (1, 3, 3), strides=(1, 3, 3))
        c7 = _lrelu(conv(p3, 1500, "conv7"))
        c8 = _lrelu(conv(c7, 1500, "conv8"))

        d1 = DepthwiseUp(name="dconv1")(c8)
        c9 = conv(d1, 300, "conv9", kernel=(1, 1, 1))
        m1 = _crop_add(c9, c6)
        c10 = _lrelu(conv(m1, 300, "conv10"))
        c11 = _lrelu(conv(c10, 300, "conv11"))

        d2 = DepthwiseUp(name="dconv2")(c11)
        c12 = conv(d2, 60, "conv12", kernel=(1, 1, 1))
        m2 = _crop_add(c12, c4)
        c13 = _lrelu(conv(m2, 60, "conv13"))
        c14 = _lrelu(conv(c13, 60, "conv14"))

        d3 = DepthwiseUp(name="dconv3")(c14)
        c15 = conv(d3, 12, "conv15", kernel=(1, 1, 1))
        m3 = _crop_add(c15, c2)
        c16 = _lrelu(conv(m3, 12, "conv16"))
        c17 = _lrelu(conv(c16, 12, "conv17"))

        out = conv(c17, self.out_planes, "conv18", kernel=(1, 1, 1))
        if self.if_sigmoid:
            out = jax.nn.sigmoid(out)
        return out
