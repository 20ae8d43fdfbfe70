"""End-to-end segmentation evaluation (reference inference_code/inference_seg.py).

Pipeline: SR volume -> tiled 3-D affinity prediction (Superhuman/MALA) ->
watershed fragments -> mean-affinity agglomeration @ threshold -> VOI / ARAND
vs ground-truth labels; writes affs.hdf / seg_waterz.hdf / scores.txt."""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np

from gpemsr_tpu.core.config import SegConfig
from gpemsr_tpu.infer.tiled3d import TileProtocol, tiled_infer
from gpemsr_tpu.seg import native
from gpemsr_tpu.seg.affinity import gen_seg_malis, seg_to_aff, seg_widen_border
from gpemsr_tpu.seg.metrics import adapted_rand_error, variation_of_information
from gpemsr_tpu.seg.watershed import relabel, watershed


def load_sr_volume(folder: str, im_path: str, num_slices: int = 125,
                   size: int = 1024, test_split: int = 50) -> np.ndarray:
    """125 SR PNGs -> [test_split, size, size] float volume (provider_valid.py:77-90)."""
    from PIL import Image
    data = np.zeros((num_slices, size, size), np.float32)
    for i in range(num_slices):
        img = Image.open(os.path.join(folder, im_path, f"{i}.png"))
        data[i] = np.asarray(img)
    return data[-test_split:]


def load_labels(label_path: str, test_split: int = 50) -> np.ndarray:
    import h5py
    with h5py.File(label_path, "r") as f:
        label = f["main"][:]
    return label[-test_split:]


@dataclass
class SegScores:
    voi_split: float
    voi_merge: float
    voi_sum: float
    arand: float
    inference_time: float

    def line(self) -> str:
        return ("waterz: voi_split=%.6f, voi_merge=%.6f, voi_sum=%.6f, "
                "arand=%.6f" % (self.voi_split, self.voi_merge,
                                self.voi_sum, self.arand))


def evaluate_segmentation(apply_fn, raw_volume: np.ndarray,
                          gt_labels: np.ndarray, cfg: SegConfig,
                          out_dir: str | None = None,
                          show: bool = False, params=None,
                          fetch_dtype=None) -> SegScores:
    """Full protocol on a raw uint8-scale volume [Z, Y, X] (values 0..255).

    apply_fn: jitted seg model on a single crop (see tiled3d.tiled_infer).
    params: pass model variables as a jit argument (apply_fn(params, crop))
    instead of closure constants — required for MALA-size nets on
    remote-compile backends."""
    proto = TileProtocol.superhuman() if cfg.model.model_type == "superhuman" \
        else TileProtocol.mala()

    labels = gt_labels.copy()
    if cfg.data.if_dilate:
        labels = seg_widen_border(labels) if cfg.data.widen_way \
            else gen_seg_malis(labels)

    t0 = time.time()
    vol = raw_volume.astype(np.float32) / 255.0
    # u8 fetch: affinities quantized to u8 on device (fine for the waterz
    # scores — its queue is 256-bin discretized) + the watershed boundary
    # computed on device from the f32 affinities, fetched f16 (u8 is too
    # coarse for seed geometry). ~262 MB vs f16's ~314 MB vs f32's ~845 MB.
    fetch_u8 = fetch_dtype is np.uint8 or fetch_dtype == np.dtype(np.uint8)
    boundary = None
    if fetch_u8:
        output_affs, boundary = tiled_infer(
            apply_fn, vol, proto, out_channels=cfg.model.output_nc,
            params=params, fetch_dtype=np.uint8, fetch_boundary=True)
    else:
        output_affs = tiled_infer(apply_fn, vol, proto,
                                  out_channels=cfg.model.output_nc,
                                  params=params, fetch_dtype=fetch_dtype)
    infer_time = time.time() - t0

    fragments = watershed(output_affs, "maxima_distance", boundary=boundary)
    segmentation = native.agglomerate(fragments, output_affs,
                                      threshold=cfg.waterz_threshold,
                                      bins=cfg.discretize_queue,
                                      scoring_function=cfg.scoring_function)
    segmentation = relabel(segmentation).astype(np.uint64)

    gt = gt_labels.astype(np.uint32)
    arand = adapted_rand_error(gt, segmentation)[0]
    voi_split, voi_merge = variation_of_information(gt, segmentation)
    scores = SegScores(voi_split, voi_merge, voi_split + voi_merge, arand,
                       infer_time)

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        import h5py
        with h5py.File(os.path.join(out_dir, "affs.hdf"), "w") as f:
            f.create_dataset("main", data=output_affs, dtype=np.float32,
                             compression="gzip")
        with h5py.File(os.path.join(out_dir, "seg_waterz.hdf"), "w") as f:
            f.create_dataset("main", data=segmentation,
                             dtype=segmentation.dtype, compression="gzip")
        with open(os.path.join(out_dir, "scores.txt"), "w") as f:
            f.write("Inference time=%.6f\n" % infer_time)
            f.write(scores.line() + "\n")
        if show:
            _write_galleries(out_dir, raw_volume, output_affs, labels,
                             segmentation, gt)
    return scores


def _write_galleries(out_dir: str, raw_volume: np.ndarray,
                     output_affs: np.ndarray, labels: np.ndarray,
                     segmentation: np.ndarray, gt: np.ndarray) -> None:
    """Result PNG galleries (reference inference_seg.py:174-191): per-slice
    predicted-vs-GT affinity panels and raw | seg | gt color renders, with
    the prediction masked to the GT foreground like the reference."""
    from PIL import Image

    from gpemsr_tpu.seg.visual import (
        affinity_gallery, draw_fragments_3d, draw_raw_image,
    )

    affs_dir = os.path.join(out_dir, "affs_img")
    seg_dir = os.path.join(out_dir, "seg_img")
    os.makedirs(affs_dir, exist_ok=True)
    os.makedirs(seg_dir, exist_ok=True)
    gt_affs = seg_to_aff(labels).astype(np.float32)
    for z, img in affinity_gallery(output_affs, gt_affs):
        Image.fromarray(img).save(os.path.join(affs_dir, f"{z:04d}.png"))
    seg_show = segmentation.copy()
    seg_show[gt == 0] = 0                       # inference_seg.py:184
    color_raw = draw_raw_image(raw_volume)
    color_seg = draw_fragments_3d(seg_show)
    color_gt = draw_fragments_3d(gt.astype(np.uint64))
    for z in range(color_seg.shape[0]):
        panel = np.concatenate(
            [color_raw[z], color_seg[z], color_gt[z]], axis=1)
        Image.fromarray(panel).save(os.path.join(seg_dir, f"{z:04d}.png"))
