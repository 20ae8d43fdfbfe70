"""Segmentation metrics: Variation of Information and Adapted Rand Error.

Replaces the reference's skimage.metrics calls (inference_seg.py:24-25,160-162)
with a sparse-contingency implementation (scipy.sparse), matching skimage
semantics: `ignore_labels` masks out pixels whose *ground-truth* label is in
the ignore set; VOI returns (split, merge) = (H(seg|gt), H(gt|seg))."""

from __future__ import annotations

import numpy as np
from scipy import sparse


def contingency_table(gt: np.ndarray, seg: np.ndarray,
                      ignore_labels=(0,), normalize: bool = True):
    gt = np.asarray(gt).ravel()
    seg = np.asarray(seg).ravel()
    if ignore_labels is not None and len(ignore_labels):
        keep = ~np.isin(gt, ignore_labels)
        gt, seg = gt[keep], seg[keep]
    gt_u, gt_i = np.unique(gt, return_inverse=True)
    seg_u, seg_i = np.unique(seg, return_inverse=True)
    data = np.ones(gt.size, np.float64)
    table = sparse.coo_matrix((data, (gt_i, seg_i)),
                              shape=(gt_u.size, seg_u.size)).tocsr()
    if normalize:
        table = table / table.sum()
    return table


def variation_of_information(gt: np.ndarray, seg: np.ndarray,
                             ignore_labels=(0,)):
    """Returns (voi_split, voi_merge) = (H(seg|gt), H(gt|seg)) in bits
    (log base 2, matching skimage)."""
    p = contingency_table(gt, seg, ignore_labels)
    pxy = p.data
    px = np.asarray(p.sum(axis=1)).ravel()
    py = np.asarray(p.sum(axis=0)).ravel()

    hxy = -np.sum(pxy * np.log2(pxy, where=pxy > 0))
    hx = -np.sum(px * np.log2(px, where=px > 0))
    hy = -np.sum(py * np.log2(py, where=py > 0))
    # H(seg|gt) = H(x,y) - H(gt); H(gt|seg) = H(x,y) - H(seg)
    voi_split = hxy - hx
    voi_merge = hxy - hy
    return float(voi_split), float(voi_merge)


def adapted_rand_error(gt: np.ndarray, seg: np.ndarray, ignore_labels=(0,)):
    """Returns (are, precision, recall); are = 1 - 2pr/(p+r)
    (skimage adapted_rand_error semantics)."""
    p = contingency_table(gt, seg, ignore_labels, normalize=False)
    n = p.sum()
    p = p / n
    sum_p2 = (p.data ** 2).sum()
    a = np.asarray(p.sum(axis=1)).ravel()
    b = np.asarray(p.sum(axis=0)).ravel()
    sum_a2 = (a ** 2).sum()
    sum_b2 = (b ** 2).sum()
    precision = sum_p2 / sum_b2
    recall = sum_p2 / sum_a2
    f = 2 * precision * recall / (precision + recall)
    return float(1.0 - f), float(precision), float(recall)
