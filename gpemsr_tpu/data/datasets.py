"""EM-stack datasets (NHWC numpy), mirroring the reference data layer:

* VQGANDataset      — HR patches, random crop + flip/rot (VQGAN_dataset.py:18-108)
* IndexerDataset    — paired HR/LR, aligned crop, joint augment (Indexer_dataset.py:16-122)
* CREMIDataset      — 5-frame LR z-window + center HR (CREMI_dataset.py:26-115),
                      incl. the `seek_path` damaged-slice substitution and the
                      2*(N-1)/2 boundary-slice trim of the GT list.

Pure-numpy, PRNG-explicit (every sample draw takes a seed), so the pipeline is
reproducible across hosts — the property DistIterSampler's epoch seeding gave
the reference."""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from gpemsr_tpu.core.config import DatasetConfig
from gpemsr_tpu.utils.image import read_img


def _numeric_sort(names):
    return sorted(int(os.path.splitext(n)[0]) for n in names)


def augment_images(imgs: list[np.ndarray], rng: np.random.Generator,
                   use_flip=True, use_rot=True):
    """Joint horizontal flip / vertical flip / transpose (data/util.py:166-181)."""
    hflip = use_flip and rng.random() < 0.5
    vflip = use_rot and rng.random() < 0.5
    rot90 = use_rot and rng.random() < 0.5

    def f(img):
        if hflip:
            img = img[:, ::-1]
        if vflip:
            img = img[::-1]
        if rot90:
            img = img.transpose(1, 0, 2)
        return np.ascontiguousarray(img)

    return [f(i) for i in imgs]


def _read_dir_whitelist(txt_path):
    with open(txt_path) as f:
        return [ln.strip() for ln in f if ln.strip()]


class VQGANDataset:
    """Stage-1 HR patches. Two-level directory tree (volume/section/NNNN.png)
    filtered by a whitelist txt; val uses a flat one-level tree."""

    def __init__(self, cfg: DatasetConfig, train: bool = True):
        self.cfg = cfg
        self.train = train
        root = cfg.dataroot_GT
        whitelist = set(_read_dir_whitelist(cfg.chooseGTtxt)) \
            if cfg.chooseGTtxt else None
        self.paths = []
        for vol in sorted(os.listdir(root)):
            if whitelist is not None and vol not in whitelist:
                continue
            vol_path = os.path.join(root, vol)
            if train:
                for sub in sorted(os.listdir(vol_path)):
                    sub_path = os.path.join(vol_path, sub)
                    for idx in _numeric_sort(os.listdir(sub_path)):
                        self.paths.append(os.path.join(sub_path, f"{idx:04d}.png"))
            else:
                for idx in _numeric_sort(os.listdir(vol_path)):
                    self.paths.append(os.path.join(vol_path, f"{idx}.png"))

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, args):
        if self.train:
            index, seed = args
            rng = np.random.default_rng(seed)
        else:
            index, rng = args, None
        img = read_img(self.paths[index])
        if not self.train:
            return img
        gs = self.cfg.GT_size
        H, W, _ = img.shape
        y = rng.integers(0, max(1, H - gs + 1))
        x = rng.integers(0, max(1, W - gs + 1))
        img = img[y:y + gs, x:x + gs]
        (img,) = augment_images([img], rng, self.cfg.use_flip, self.cfg.use_rot)
        return img


class IndexerDataset:
    """Stage-2 paired HR/LR patches; LR path mirrors the HR relative path."""

    def __init__(self, cfg: DatasetConfig, scale: int, train: bool = True):
        self.cfg = cfg
        self.scale = scale
        self.train = train
        self.gt_root = cfg.dataroot_GT
        self.lr_root = cfg.dataroot_LQ
        inner = VQGANDataset(cfg, train=train)
        self.paths = inner.paths

    def __len__(self):
        return len(self.paths)

    def _lr_path(self, gt_path):
        rel = os.path.relpath(gt_path, self.gt_root)
        return os.path.join(self.lr_root, rel)

    def __getitem__(self, args):
        if self.train:
            index, seed = args
            rng = np.random.default_rng(seed)
        else:
            index = args
        gt = read_img(self.paths[index])
        lr = read_img(self._lr_path(self.paths[index]))
        if not self.train:
            return gt, lr
        gs = self.cfg.GT_size
        ls = gs // self.scale
        Hl, Wl, _ = lr.shape
        y = rng.integers(0, max(1, Hl - ls + 1))
        x = rng.integers(0, max(1, Wl - ls + 1))
        lr = lr[y:y + ls, x:x + ls]
        gt = gt[y * self.scale:y * self.scale + gs,
                x * self.scale:x * self.scale + gs]
        gt, lr = augment_images([gt, lr], rng, self.cfg.use_flip, self.cfg.use_rot)
        return gt, lr


def seek_slice(dir_path: str, center: int, offset: int) -> str:
    """Damaged-slice substitution: walk backwards until an existing slice is
    found (CREMI_dataset.py:104-115 semantics)."""
    while True:
        p = os.path.join(dir_path, f"{center + offset}.png")
        if os.path.exists(p):
            return p
        offset -= 1


class CREMIDataset:
    """Stage-3 multi-frame dataset: N-frame LR window + center HR.

    Returns {'LQ': [N, h, w, 1], 'GT': [H, W, 1]} (NHWC)."""

    def __init__(self, cfg: DatasetConfig, scale: int, train: bool = True):
        self.cfg = cfg
        self.scale = scale
        self.train = train
        self.N = cfg.N_frames
        half = (self.N - 1) // 2
        self.offsets = list(range(-half, half + 1))
        self.gt_list = []
        for vol in sorted(os.listdir(cfg.dataroot_GT)):
            vol_path = os.path.join(cfg.dataroot_GT, vol)
            ids = _numeric_sort(os.listdir(vol_path))
            # trim 2*half boundary slices on each side (CREMI_dataset.py:45)
            for i in ids[2 * half: len(ids) - 2 * half]:
                self.gt_list.append(os.path.join(vol_path, f"{i}.png"))

    def __len__(self):
        return len(self.gt_list)

    def __getitem__(self, args):
        if self.train:
            index, seed = args
            rng = np.random.default_rng(seed)
        else:
            index = args
        gt_path = self.gt_list[index]
        gt = read_img(gt_path)
        vol = os.path.basename(os.path.dirname(gt_path))
        center = int(os.path.splitext(os.path.basename(gt_path))[0])
        lq_dir = os.path.join(self.cfg.dataroot_LQ, vol)
        frames = [read_img(seek_slice(lq_dir, center, o)) for o in self.offsets]

        if self.train:
            if self.cfg.random_reverse and rng.random() < 0.5:
                frames = frames[::-1]        # temporal flip augmentation
            gs = self.cfg.GT_size
            ls = gs // self.scale
            Hl, Wl, _ = frames[0].shape
            y = rng.integers(0, max(1, Hl - ls + 1))
            x = rng.integers(0, max(1, Wl - ls + 1))
            frames = [f[y:y + ls, x:x + ls] for f in frames]
            gt = gt[y * self.scale:y * self.scale + gs,
                    x * self.scale:x * self.scale + gs]
            out = augment_images(frames + [gt], rng,
                                 self.cfg.use_flip, self.cfg.use_rot)
            frames, gt = out[:-1], out[-1]
        return {"LQ": np.stack(frames, 0), "GT": gt}
