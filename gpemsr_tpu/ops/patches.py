"""Patch extraction matching the reference's `extract_image_patches`
(model/GPEMSR.py:32-60): reflect 'same' padding + torch Unfold, channel-major
(C, kh, kw) patch ordering. Used by the VGG patch-similarity prior mask."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def same_padding_reflect(x: jax.Array, ksize, stride):
    """Reflect-pad NHWC so that a (ksize, stride) sliding window is 'same'."""
    _, H, W, _ = x.shape
    kh, kw = ksize
    sh, sw = stride
    out_h = -(-H // sh)
    out_w = -(-W // sw)
    pad_h = max(0, (out_h - 1) * sh + kh - H)
    pad_w = max(0, (out_w - 1) * sw + kw - W)
    top, left = pad_h // 2, pad_w // 2
    return jnp.pad(x, ((0, 0), (top, pad_h - top), (left, pad_w - left), (0, 0)),
                   mode="reflect")


def extract_patches(x: jax.Array, ksize=(16, 16), stride=(16, 16),
                    padding: str = "same") -> jax.Array:
    """NHWC -> [B, C*kh*kw, L] patches, ordered like torch Unfold.

    torch Unfold flattens each patch channel-major: index = c*kh*kw + i*kw + j,
    and enumerates patch locations row-major."""
    if padding == "same":
        x = same_padding_reflect(x, ksize, stride)
    B, H, W, C = x.shape
    kh, kw = ksize
    sh, sw = stride
    # conv_general_dilated_patches on NCHW produces channels ordered (c, i, j).
    patches = lax.conv_general_dilated_patches(
        x.transpose(0, 3, 1, 2), filter_shape=(kh, kw),
        window_strides=(sh, sw), padding="VALID",
        precision=lax.Precision.HIGHEST)
    _, CK, oh, ow = patches.shape
    return patches.reshape(B, CK, oh * ow)
