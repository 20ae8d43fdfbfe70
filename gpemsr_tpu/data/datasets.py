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
from gpemsr_tpu.data.pack import get_fs


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
        # dataroot may be a directory tree or a .pack single-file store (the
        # reference's img/lmdb duality, data/util.py:35-72); paths are kept
        # relative to the root either way
        self.fs = get_fs(cfg.dataroot_GT)
        whitelist = set(_read_dir_whitelist(cfg.chooseGTtxt)) \
            if cfg.chooseGTtxt else None
        self.paths = []
        for vol in self.fs.listdir(""):
            if whitelist is not None and vol not in whitelist:
                continue
            if train:
                for sub in self.fs.listdir(vol):
                    for idx in _numeric_sort(self.fs.listdir(f"{vol}/{sub}")):
                        self.paths.append(f"{vol}/{sub}/{idx:04d}.png")
            else:
                for idx in _numeric_sort(self.fs.listdir(vol)):
                    self.paths.append(f"{vol}/{idx}.png")

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, args):
        if self.train:
            index, seed = args
            rng = np.random.default_rng(seed)
        else:
            index, rng = args, None
        img = self.fs.read_img(self.paths[index])
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
        inner = VQGANDataset(cfg, train=train)
        self.gt_fs = inner.fs
        self.lr_fs = get_fs(cfg.dataroot_LQ)
        # LR tree mirrors the HR relative layout (Indexer_dataset.py:16-40)
        self.paths = inner.paths

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, args):
        if self.train:
            index, seed = args
            rng = np.random.default_rng(seed)
        else:
            index = args
        gt = self.gt_fs.read_img(self.paths[index])
        lr = self.lr_fs.read_img(self.paths[index])
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


def seek_slice(dir_path: str, center: int, offset: int, fs=None) -> str:
    """Damaged-slice substitution: walk backwards until an existing slice is
    found (CREMI_dataset.py:104-115 semantics). With `fs`, dir_path is a
    path relative to the fs root."""
    if fs is None:
        join, exists = os.path.join, os.path.exists
    else:
        join, exists = (lambda a, b: f"{a}/{b}"), fs.exists
    while True:
        p = join(dir_path, f"{center + offset}.png")
        if exists(p):
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
        self.gt_fs = get_fs(cfg.dataroot_GT)
        self.lq_fs = get_fs(cfg.dataroot_LQ)
        self.gt_list = []
        for vol in self.gt_fs.listdir(""):
            ids = _numeric_sort(self.gt_fs.listdir(vol))
            # trim 2*half boundary slices on each side (CREMI_dataset.py:45)
            for i in ids[2 * half: len(ids) - 2 * half]:
                self.gt_list.append(f"{vol}/{i}.png")

    def __len__(self):
        return len(self.gt_list)

    def __getitem__(self, args):
        if self.train:
            index, seed = args
            rng = np.random.default_rng(seed)
        else:
            index = args
        gt_path = self.gt_list[index]
        gt = self.gt_fs.read_img(gt_path)
        vol, fname = gt_path.rsplit("/", 1)
        center = int(os.path.splitext(fname)[0])
        frames = [self.lq_fs.read_img(seek_slice(vol, center, o, self.lq_fs))
                  for o in self.offsets]

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
