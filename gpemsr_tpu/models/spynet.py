"""SpyNet optical flow (frozen inside POD alignment, GPEMSR.py:65-69,99-100).

Re-implementation of the basicsr SpyNet semantics in NHWC flax: 6-level
BasicModule pyramid (7x7 convs), coarse-to-fine flow with x2-upsampled flow
(align_corners=True) and border-padded warping. Weights convert 1:1 from the
pretrained `spynet_sintel_final` checkpoint via convert.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gpemsr_tpu.ops.resize import resize_bilinear
from gpemsr_tpu.ops.warp_pallas import spynet_flow_warp

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class BasicModule(nn.Module):
    """One pyramid level: 5 7x7 convs (32-64-32-16-2), ReLU between."""

    @nn.compact
    def __call__(self, x):
        widths = (32, 64, 32, 16)
        for i, wdt in enumerate(widths):
            x = nn.Conv(wdt, (7, 7), padding=[(3, 3)] * 2, name=f"conv{i}")(x)
            x = jax.nn.relu(x)
        return nn.Conv(2, (7, 7), padding=[(3, 3)] * 2, name="conv4")(x)


class SpyNet(nn.Module):
    levels: int = 6

    @nn.compact
    def __call__(self, ref, supp):
        """ref/supp: NHWC images in [0,1], 1 or 3 channels, sizes multiple
        of 32 (callers upsample 4x from LR so this holds). Returns flow
        [B, H, W, 2] with (dx, dy) channels."""
        def preprocess(x):
            if x.shape[-1] == 1:
                x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
            return (x - _MEAN) / _STD

        ref_l = [preprocess(ref)]
        supp_l = [preprocess(supp)]
        for _ in range(self.levels - 1):
            ref_l.insert(0, nn.avg_pool(ref_l[0], (2, 2), strides=(2, 2)))
            supp_l.insert(0, nn.avg_pool(supp_l[0], (2, 2), strides=(2, 2)))

        B, H0, W0, _ = ref_l[0].shape
        flow = jnp.zeros((B, H0, W0, 2), ref.dtype)
        for level in range(self.levels):
            if level == 0:
                flow_up = flow
            else:
                h, w = ref_l[level].shape[1:3]
                flow_up = resize_bilinear(flow, h, w, align_corners=True) * 2.0
            warped = spynet_flow_warp(supp_l[level], flow_up)
            inp = jnp.concatenate([ref_l[level], warped, flow_up], axis=-1)
            flow = flow_up + BasicModule(name=f"basic_module{level}")(inp)
        return flow
