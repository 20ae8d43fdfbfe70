"""Tests for the segmentation post-processing chain (native core + metrics)."""

import numpy as np
import pytest
from scipy import ndimage

from gpemsr_tpu.seg import native
from gpemsr_tpu.seg.affinity import (
    mknhood3d, seg_to_aff, seg_widen_border, weight_binary_ratio,
)
from gpemsr_tpu.seg.metrics import adapted_rand_error, variation_of_information
from gpemsr_tpu.seg.watershed import relabel, watershed


def test_edt_matches_scipy(rng):
    mask = rng.uniform(0, 1, (37, 53)) > 0.3
    out = native.edt2d_sq(mask)
    ref = ndimage.distance_transform_edt(mask) ** 2
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_label2d():
    m = np.array([[1, 1, 0, 1],
                  [0, 1, 0, 1],
                  [0, 0, 0, 1],
                  [1, 0, 1, 1]], np.uint8)
    lab, n = native.label2d(m, conn=4)
    assert n == 3
    assert lab[0, 0] == lab[1, 1]
    assert lab[0, 3] == lab[3, 3] == lab[3, 2]
    assert lab[3, 0] not in (lab[0, 0], lab[0, 3])


def test_regmax_plateaus():
    img = np.array([[1, 1, 1, 1],
                    [1, 3, 3, 1],
                    [1, 3, 3, 1],
                    [1, 1, 1, 2]], np.float32)
    mx = native.regmax2d(img)
    assert mx[1, 1] and mx[1, 2] and mx[2, 1] and mx[2, 2]
    assert mx[3, 3]          # 2 is a regional max (no greater 4-neighbour)
    assert not mx[0, 0]


def test_cwatershed_two_basins():
    surface = np.array([[0, 0, 5, 0, 0],
                        [0, 0, 5, 0, 0],
                        [0, 0, 5, 0, 0]], np.float32)
    markers = np.zeros_like(surface, np.int32)
    markers[1, 0] = 1
    markers[1, 4] = 2
    out = native.cwatershed2d(surface, markers)
    assert (out[:, :2] == 1).all()
    assert (out[:, 3:] == 2).all()
    assert set(np.unique(out)) == {1, 2}


def test_watershed_fragments_synthetic():
    # two clear objects separated by a low-affinity wall
    seg = np.zeros((2, 20, 20), np.uint64)
    seg[:, :, :9] = 1
    seg[:, :, 11:] = 2
    affs = seg_to_aff(seg)
    frags = watershed(affs)
    # fragments should separate left/right halves in every slice
    for z in range(2):
        left = frags[z, :, :8]
        right = frags[z, :, 12:]
        assert np.unique(left).size == 1
        assert np.unique(right).size == 1
        assert left[0, 0] != right[0, 0]


def test_agglomerate_merges_same_object():
    # one object artificially split into two fragments with high affinity
    # between them -> agglomeration should merge them, but not across the
    # low-affinity boundary to the second object
    Z, Y, X = 2, 8, 8
    frag = np.zeros((Z, Y, X), np.uint64)
    frag[:, :, :2] = 1
    frag[:, :, 2:4] = 2     # same object as 1
    frag[:, :, 4:] = 3      # different object
    affs = np.ones((3, Z, Y, X), np.float32)
    affs[2, :, :, 4] = 0.0  # wall between x=3 and x=4
    out = native.agglomerate(frag, affs, threshold=0.5)
    assert out[0, 0, 0] == out[0, 0, 3]
    assert out[0, 0, 0] != out[0, 0, 5]


def test_seg_to_aff_replicate_pad():
    seg = np.array([[[1, 1, 2],
                     [1, 0, 2]]], np.int64)   # [1, 2, 3]
    aff = seg_to_aff(seg, mknhood3d(1))
    assert aff.shape == (3, 1, 2, 3)
    # z channel at z=0 is the foreground mask (replicate pad)
    np.testing.assert_array_equal(aff[0, 0], (seg[0] > 0))
    # y channel: row 1 vs row 0
    assert aff[1, 0, 1, 0] == 1.0    # seg 1 == 1
    assert aff[1, 0, 1, 1] == 0.0    # 0 vs 1
    # x channel: col j vs j-1
    assert aff[2, 0, 0, 1] == 1.0
    assert aff[2, 0, 0, 2] == 0.0


def test_seg_widen_border():
    seg = np.zeros((1, 6, 6), np.int64)
    seg[0, :, :3] = 1
    seg[0, :, 3:] = 2
    out = seg_widen_border(seg.copy(), tsz_h=1)
    # voxels adjacent to the 1|2 boundary become 0
    assert (out[0, :, 2] == 0).all()
    assert (out[0, :, 3] == 0).all()
    assert (out[0, :, 0] == 1).all()
    assert (out[0, :, 5] == 2).all()


def test_weight_binary_ratio():
    lab = np.zeros((10, 10), np.float32)
    lab[:2] = 1  # 20% positive
    w = weight_binary_ratio(lab)
    # smaller class (positives) gets weight (1-f)/f = 4
    np.testing.assert_allclose(w[lab == 1], 4.0, rtol=1e-6)
    np.testing.assert_allclose(w[lab == 0], 1.0)


def test_voi_perfect_and_split():
    gt = np.array([[1, 1, 2, 2]] * 4)
    assert variation_of_information(gt, gt) == (0.0, 0.0)
    seg_split = np.array([[1, 3, 2, 2]] * 4)     # splits object 1
    s, m = variation_of_information(gt, seg_split)
    assert s > 0 and abs(m) < 1e-9


def test_arand_perfect_and_merge():
    gt = np.array([[1, 1, 2, 2]] * 4)
    are, p, r = adapted_rand_error(gt, gt)
    assert are < 1e-9
    seg_m = np.ones_like(gt)                      # full merge
    are_m, p_m, r_m = adapted_rand_error(gt, seg_m)
    assert are_m > 0.3
    # merged seg has perfect recall (all gt pairs joined), poor precision
    assert r_m > 0.99 and p_m < 0.7


def test_relabel():
    seg = np.array([[5, 5, 9], [0, 9, 9]])
    out = relabel(seg.copy())
    assert set(np.unique(out)) == {0, 1, 2}


def test_instance_boundary_and_distance_targets(rng):
    from gpemsr_tpu.seg.targets import (distance_transform_target,
                                        seg_to_instance_bd,
                                        skeleton_aware_weight)
    seg = np.zeros((2, 12, 12), np.int64)
    seg[:, :, :5] = 1
    seg[:, :, 7:] = 2
    bd = seg_to_instance_bd(seg)
    assert bd.shape == seg.shape
    assert bd[0, 0, 4] == 1 and bd[0, 0, 7] == 1    # object/background edges
    assert bd[0, 0, 1] == 0
    dt = distance_transform_target(seg)
    assert dt.shape == seg.shape
    assert dt[0, 6, 2] > dt[0, 6, 4]                # deeper inside -> larger
    assert (dt[:, :, 5:7] == 0).all()               # background zero
    w = skeleton_aware_weight(dt)
    assert w.shape == dt.shape and (w >= 1).all()


def test_result_galleries(tmp_path, rng):
    """The CLI's --show galleries (reference inference_seg.py:174-191):
    per-slice affinity panels (pred over gt, channels side by side) and
    raw|seg|gt color renders."""
    import os

    from PIL import Image

    from gpemsr_tpu.seg.inference import _write_galleries

    Z, S = 3, 24
    raw = rng.integers(0, 255, (Z, S, S)).astype(np.float32)
    affs = rng.uniform(0, 1, (3, Z, S, S)).astype(np.float32)
    labels = rng.integers(0, 4, (Z, S, S)).astype(np.uint32)
    seg = rng.integers(0, 4, (Z, S, S)).astype(np.uint64)
    _write_galleries(str(tmp_path), raw, affs, labels, seg, labels)
    affs_pngs = sorted(os.listdir(tmp_path / "affs_img"))
    seg_pngs = sorted(os.listdir(tmp_path / "seg_img"))
    assert len(affs_pngs) == Z and len(seg_pngs) == Z
    a = np.asarray(Image.open(tmp_path / "affs_img" / affs_pngs[0]))
    assert a.shape == (2 * S, 3 * S)           # pred row over gt row
    s = np.asarray(Image.open(tmp_path / "seg_img" / seg_pngs[0]))
    assert s.shape == (S, 3 * S, 3)            # raw | seg | gt
    # prediction masked to gt foreground: background pixels stay black
    bg = labels[0] == 0
    assert (s[:, S:2 * S][bg] == 0).all()


def test_training_debug_plotters(rng):
    """show.py plotter-family equivalents: training panel, fragment overlay,
    seed markers."""
    from gpemsr_tpu.seg.visual import (
        draw_seeds, overlay_fragments, training_panel,
    )
    D, S = 4, 16
    raw = rng.uniform(0, 1, (D, S, S)).astype(np.float32)
    pred = rng.uniform(0, 1, (3, D, S, S)).astype(np.float32)
    tgt = rng.uniform(0, 1, (D, S, S, 3)).astype(np.float32)   # DHWC form
    panel = training_panel(raw, pred, tgt)
    assert panel.shape == (S, 7 * S) and panel.dtype == np.uint8

    vol = rng.integers(0, 255, (D, S, S)).astype(np.float32)
    seg = rng.integers(0, 3, (D, S, S)).astype(np.uint32)
    ov = overlay_fragments(vol, seg, alpha=0.5)
    assert ov.shape == (D, S, S, 3)
    bg = seg == 0
    np.testing.assert_array_equal(      # background keeps raw gray
        ov[bg][:, 0], np.clip(vol[bg], 0, 255).astype(np.uint8))

    seeds = np.zeros((S, S), np.uint32)
    seeds[5, 5] = 1
    d = draw_seeds(vol[0], seeds)
    assert tuple(d[5, 5]) == (255, 0, 0) and d.shape == (S, S, 3)


def test_coordinate_arithmetic():
    """Coordinate parity (reference utils/coordinate.py:3)."""
    from gpemsr_tpu.seg.coordinate import Coordinate

    a = Coordinate((2, 3, 4))
    b = Coordinate((10, 5, 1))
    assert a * b == (20, 15, 4)
    assert a + b == (12, 8, 5)
    assert b - a == (8, 2, -3)
    assert -a == (-2, -3, -4)
    assert abs(Coordinate((-1, 2, -3))) == (1, 2, 3)
    assert a * 2 == (4, 6, 8)
    assert b // 2 == (5, 2, 0)
    assert a.dims() == 3
    c = Coordinate((1, None, 3)) + (1, 1, 1)
    assert c == (2, None, 4)


def test_gen_seeds_and_erosion():
    """Seed utilities parity (reference seeds_func.py:44-113)."""
    from gpemsr_tpu.seg.seeds import erosion_labels, gen_seeds, gen_seeds_2

    labels = np.zeros((32, 32), np.int32)
    labels[4:14, 4:14] = 5
    labels[18:30, 18:30] = 9
    labels[0, 0] = 7                      # tiny blob -> removed (min_size)
    # reference semantics: the EDT lives INSIDE the zero-affinity band
    # (mahotas.distance(boundary < 0.5)), and each label's seed is its
    # deepest overlap with that band — so give each label a zero pocket
    affs = np.ones((32, 32), np.float32)
    affs[6:12, 6:12] = 0                  # pocket inside label 5
    affs[20:28, 20:28] = 0                # pocket inside label 9

    seeds, boundary = gen_seeds(labels.copy(), affs, min_size=10)
    assert boundary[0, 0] == 1            # forced frame
    ids = np.unique(seeds)
    assert list(ids) == [0, 1, 2]         # renumbered
    assert (seeds > 0).sum() == 2         # exactly one seed per kept label
    # each seed sits inside its own label's support, at the pocket center
    ys, xs = np.nonzero(seeds)
    assert {labels[y, x] for y, x in zip(ys, xs)} == {5, 9}

    seeds2 = gen_seeds_2(labels.copy(), affs, min_size=10)
    assert set(np.unique(seeds2)) == {0, 5, 9}   # original ids kept

    er = erosion_labels(labels.copy(), steps=2)
    assert set(np.unique(er)) <= {0, 5, 7, 9}
    assert (er == 5).sum() < (labels == 5).sum()     # shrank
    assert er[4, 4] == 0                              # corner eroded away


def test_watershed_worker_invariance():
    """Fragments are identical for any thread-pool size (slices independent,
    deterministic id offsets) and for both seed methods."""
    rng = np.random.default_rng(7)
    affs = rng.uniform(0, 1, (3, 4, 32, 32)).astype(np.float32)
    for method in ("maxima_distance", "grid"):
        f1 = watershed(affs, seed_method=method, workers=1)
        f3 = watershed(affs, seed_method=method, workers=3)
        np.testing.assert_array_equal(f1, f3)
