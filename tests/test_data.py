"""Data layer tests: datasets on synthetic PNG trees, seek_path substitution,
epoch-seeded shard sampler, loader determinism, MATLAB bicubic."""

import os

import numpy as np
import pytest
from PIL import Image

from gpemsr_tpu.core.config import DatasetConfig
from gpemsr_tpu.data.datasets import CREMIDataset, IndexerDataset, VQGANDataset, seek_slice
from gpemsr_tpu.data.resize import imresize_np
from gpemsr_tpu.data.sampler import EpochShardSampler, Loader


def _write_png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint8)).save(path)


@pytest.fixture
def cremi_tree(tmp_path, rng):
    """Volume dirs with numeric slices; slice 7 deleted (damaged)."""
    gt = tmp_path / "HR"
    lq = tmp_path / "LR"
    for z in range(16):
        img = rng.integers(0, 255, (64, 64))
        _write_png(str(gt / "volA" / f"{z}.png"), img)
        if z != 7:  # slice 7 of LR is 'damaged' (deleted)
            _write_png(str(lq / "volA" / f"{z}.png"),
                       rng.integers(0, 255, (16, 16)))
    return str(gt), str(lq)


def test_cremi_dataset_window_and_seek(cremi_tree):
    gt_root, lq_root = cremi_tree
    cfg = DatasetConfig(dataroot_GT=gt_root, dataroot_LQ=lq_root, N_frames=5,
                        GT_size=32, LQ_size=8)
    ds = CREMIDataset(cfg, scale=4, train=True)
    # 16 slices, trim 2*2 per side -> 8 centers
    assert len(ds) == 8
    item = ds[(0, 123)]
    assert item["LQ"].shape == (5, 8, 8, 1)
    assert item["GT"].shape == (32, 32, 1)
    # seek_slice: missing slice 7 resolves to slice 6
    p = seek_slice(os.path.join(lq_root, "volA"), 7, 0)
    assert p.endswith("6.png")
    p2 = seek_slice(os.path.join(lq_root, "volA"), 5, 2)  # 7 missing -> 6
    assert p2.endswith("6.png")


def test_cremi_dataset_determinism(cremi_tree):
    gt_root, lq_root = cremi_tree
    cfg = DatasetConfig(dataroot_GT=gt_root, dataroot_LQ=lq_root, N_frames=5,
                        GT_size=32, LQ_size=8)
    ds = CREMIDataset(cfg, scale=4, train=True)
    a = ds[(3, 42)]
    b = ds[(3, 42)]
    c = ds[(3, 43)]
    np.testing.assert_array_equal(a["GT"], b["GT"])
    assert not np.array_equal(a["GT"], c["GT"])  # different seed, diff crop


def test_vqgan_and_indexer_datasets(tmp_path, rng):
    gt = tmp_path / "HR"
    lr = tmp_path / "LR"
    (tmp_path / "wl.txt").write_text("volA\n")
    for sub in ["s0", "s1"]:
        for i in range(3):
            img = rng.integers(0, 255, (64, 64))
            _write_png(str(gt / "volA" / sub / f"{i:04d}.png"), img)
            _write_png(str(lr / "volA" / sub / f"{i:04d}.png"),
                       rng.integers(0, 255, (16, 16)))
    cfg = DatasetConfig(dataroot_GT=str(gt), dataroot_LQ=str(lr),
                        chooseGTtxt=str(tmp_path / "wl.txt"), GT_size=32)
    ds = VQGANDataset(cfg, train=True)
    assert len(ds) == 6
    img = ds[(0, 7)]
    assert img.shape == (32, 32, 1) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0

    ids = IndexerDataset(cfg, scale=4, train=True)
    gt_p, lr_p = ids[(1, 9)]
    assert gt_p.shape == (32, 32, 1) and lr_p.shape == (8, 8, 1)


def test_shard_sampler_disjoint_and_seeded():
    s0 = EpochShardSampler(100, host_id=0, host_count=4, ratio=2, base_seed=3)
    s1 = EpochShardSampler(100, host_id=1, host_count=4, ratio=2, base_seed=3)
    a0 = s0.epoch_indices(5)
    a1 = s1.epoch_indices(5)
    assert len(a0) == len(a1) == 50
    # same epoch -> deterministic
    np.testing.assert_array_equal(a0, s0.epoch_indices(5))
    # different epoch -> different permutation
    assert not np.array_equal(a0, s0.epoch_indices(6))
    # hosts take strided slices of one global permutation (disjoint positions)
    full = np.random.default_rng(3 + 5).permutation(200) % 100
    np.testing.assert_array_equal(a0, full[0::4])
    np.testing.assert_array_equal(a1, full[1::4])


def test_loader_orders_batches(cremi_tree):
    gt_root, lq_root = cremi_tree
    cfg = DatasetConfig(dataroot_GT=gt_root, dataroot_LQ=lq_root, N_frames=5,
                        GT_size=32, LQ_size=8)
    ds = CREMIDataset(cfg, scale=4, train=True)
    sampler = EpochShardSampler(len(ds), ratio=2)
    loader = Loader(ds, batch_size=4, sampler=sampler, num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == len(sampler.epoch_indices(0)) // 4
    assert batches[0]["LQ"].shape == (4, 5, 8, 8, 1)
    # deterministic across replays
    again = list(loader.epoch(0))
    np.testing.assert_array_equal(batches[0]["GT"], again[0]["GT"])


def test_matlab_bicubic_properties(rng):
    img = rng.uniform(0, 1, (32, 32, 1)).astype(np.float32)
    down = imresize_np(img, 0.25)
    assert down.shape == (8, 8, 1)
    up = imresize_np(img, 2.0)
    assert up.shape == (64, 64, 1)
    # constant image stays constant (weight normalisation)
    const = np.full((16, 16, 1), 0.5, np.float32)
    np.testing.assert_allclose(imresize_np(const, 0.5), 0.5, atol=1e-6)
    np.testing.assert_allclose(imresize_np(const, 2.0), 0.5, atol=1e-6)
