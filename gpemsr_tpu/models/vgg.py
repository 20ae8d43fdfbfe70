"""VGG19 feature extractor (frozen; prior-mask similarity + contextual loss).

Reference model/VGG.py:7-52 slices torchvision VGG19 features at
relu1_2 / relu2_2 / relu3_4 / relu4_4 / relu5_4. We only materialise the
slices a caller asks for (`max_layer`), so the prior-mask branch (relu1_2
only) runs 2 convs instead of 16. Weights convert from any torchvision VGG19
state_dict (convert.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (convs per stage, channels) — standard VGG19 feature stack
_STAGES = ((2, 64), (2, 128), (4, 256), (4, 512), (4, 512))
LAYER_NAMES = ("relu1_2", "relu2_2", "relu3_4", "relu4_4", "relu5_4")

VGG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
VGG_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG19Features(nn.Module):
    """NHWC, 3-channel input. Returns dict of the requested relu features."""
    max_layer: str = "relu5_4"

    @nn.compact
    def __call__(self, x):
        out = {}
        stop = LAYER_NAMES.index(self.max_layer)
        h = x
        for s, (n_convs, ch) in enumerate(_STAGES):
            if s > 0:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            for ci in range(n_convs):
                h = nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2,
                            name=f"conv{s + 1}_{ci + 1}")(h)
                h = jax.nn.relu(h)
            out[LAYER_NAMES[s]] = h
            if s == stop:
                break
        return out


def normalize_for_vgg(x):
    """ImageNet normalization used by the contextual loss (contextual.py:207-224).
    The prior-mask branch feeds VGG unnormalized (GPEMSR.py:345,349)."""
    return (x - VGG_MEAN) / VGG_STD
