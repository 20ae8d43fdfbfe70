"""Training data provider for the segmentation nets.

Capability parity with reference inference_code/data/data_provider_labeled.py:36-361
(`Train` + `Provider`): random 3-D crops from CREMI-style (raw, label) h5
volumes with flip/transpose, intensity, and elastic augmentation, emitting
(image, affinity, rebalance-weight) triples."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy import ndimage

from gpemsr_tpu.seg.affinity import seg_to_aff, seg_widen_border, weight_binary_ratio


@dataclass
class SegAugmentConfig:
    if_filp_aug: bool = True          # (sic — reference key spelling)
    if_intensity_aug: bool = True
    if_elastic_aug: bool = True
    if_scale_aug: bool = False
    elastic_alpha: float = 12.0
    elastic_sigma: float = 4.0
    intensity_scale: float = 0.1
    intensity_shift: float = 0.1


def elastic_deform_2d(img: np.ndarray, lab: np.ndarray, rng,
                      alpha: float, sigma: float):
    """Per-slice elastic warp applied jointly to raw (bilinear) and labels
    (nearest)."""
    h, w = img.shape[-2:]
    dx = ndimage.gaussian_filter(rng.uniform(-1, 1, (h, w)), sigma) * alpha
    dy = ndimage.gaussian_filter(rng.uniform(-1, 1, (h, w)), sigma) * alpha
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = [np.clip(yy + dy, 0, h - 1), np.clip(xx + dx, 0, w - 1)]
    img_out = np.empty_like(img)
    lab_out = np.empty_like(lab)
    for z in range(img.shape[0]):
        img_out[z] = ndimage.map_coordinates(img[z], coords, order=1,
                                             mode="reflect")
        lab_out[z] = ndimage.map_coordinates(lab[z], coords, order=0,
                                             mode="reflect")
    return img_out, lab_out


class SegTrainProvider:
    """Random-crop provider over (raw [Z,Y,X] uint8, labels [Z,Y,X] int)."""

    def __init__(self, raw: np.ndarray, labels: np.ndarray,
                 crop_size=(18, 160, 160), aug: SegAugmentConfig | None = None,
                 widen_border: bool = True):
        assert raw.shape == labels.shape
        self.raw = raw
        self.labels = labels
        self.crop = crop_size
        self.aug = aug or SegAugmentConfig()
        self.widen = widen_border

    def sample(self, seed: int):
        rng = np.random.default_rng(seed)
        cz, cy, cx = self.crop
        Z, Y, X = self.raw.shape
        z = rng.integers(0, Z - cz + 1)
        y = rng.integers(0, Y - cy + 1)
        x = rng.integers(0, X - cx + 1)
        img = self.raw[z:z + cz, y:y + cy, x:x + cx].astype(np.float32) / 255.0
        lab = self.labels[z:z + cz, y:y + cy, x:x + cx].copy()

        a = self.aug
        if a.if_filp_aug:
            if rng.random() < 0.5:
                img, lab = img[:, :, ::-1], lab[:, :, ::-1]
            if rng.random() < 0.5:
                img, lab = img[:, ::-1], lab[:, ::-1]
            if rng.random() < 0.5:
                img = img.transpose(0, 2, 1)
                lab = lab.transpose(0, 2, 1)
        if a.if_elastic_aug and rng.random() < 0.5:
            img, lab = elastic_deform_2d(img, lab, rng,
                                         a.elastic_alpha, a.elastic_sigma)
        if a.if_intensity_aug and rng.random() < 0.5:
            img = img * (1 + rng.uniform(-a.intensity_scale, a.intensity_scale))
            img = img + rng.uniform(-a.intensity_shift, a.intensity_shift)
            img = np.clip(img, 0.0, 1.0)

        lab = np.ascontiguousarray(lab)
        if self.widen:
            lab = seg_widen_border(lab)
        affs = seg_to_aff(lab).astype(np.float32)
        weight = weight_binary_ratio(affs)
        img = np.ascontiguousarray(img, np.float32)
        return img[..., None], affs, weight

    def batch(self, batch_size: int, seed: int):
        imgs, affs, ws = zip(*(self.sample(seed * 65521 + i)
                               for i in range(batch_size)))
        return (np.stack(imgs), np.stack(affs), np.stack(ws))
