"""Long-range affinities + mutex watershed (alternative segmentation path).

Capability parity with reference inference_code/utils/shift_channels.py:2-47
(offset lists), utils/affinity_ours.py:115-153 (gen_affs_mutex_3d) and
utils/seg_mutex.py (elf mutex-watershed wrapper). The mutex watershed itself
is implemented natively (cpp/emseg.cc mutex_watershed)."""

from __future__ import annotations

import numpy as np

from gpemsr_tpu.seg import native


def shift_func(n_channels: int = 12) -> list[list[int]]:
    """Offset list for the 12-channel long-range affinity convention:
    3 direct neighbours + 9 long-range (z-2/3/4 and xy -3/-9/-27 shifts)."""
    if n_channels == 12:
        return [[-1, 0, 0], [0, -1, 0], [0, 0, -1],
                [-2, 0, 0], [0, -3, 0], [0, 0, -3],
                [-3, 0, 0], [0, -9, 0], [0, 0, -9],
                [-4, 0, 0], [0, -27, 0], [0, 0, -27]]
    raise ValueError(f"unsupported shift channel count {n_channels}")


def gen_affs_mutex_3d(seg: np.ndarray, shift: list[list[int]],
                      padding: bool = True, background: bool = True
                      ) -> np.ndarray:
    """Segmentation -> affinities over arbitrary offsets; with background=True
    edges touching label 0 are 0."""
    shape = seg.shape
    E = len(shift)
    affs = np.zeros((E,) + shape, np.float32)
    for e, off in enumerate(shift):
        src = tuple(slice(max(0, -o), max(0, min(s, s - o)))
                    for o, s in zip(off, shape))
        dst = tuple(slice(max(0, o), max(0, min(s, s + o)))
                    for o, s in zip(off, shape))
        a, b = seg[src], seg[dst]
        eq = (a == b)
        if background:
            eq = eq & (a > 0) & (b > 0)
        affs[(e,) + src] = eq.astype(np.float32)
        if padding:
            # out-of-range region: replicate the foreground mask
            mask = np.ones(shape, bool)
            mask[src] = False
            affs[e][mask] = (seg[mask] > 0).astype(np.float32)
    return affs


def mutex_watershed(affs: np.ndarray, offsets: list[list[int]] | None = None,
                    n_attractive: int = 3) -> np.ndarray:
    """Mutex watershed over mixed attractive (short-range) / repulsive
    (long-range) affinities. affs [E, Z, Y, X]; the first `n_attractive`
    channels are attractive, the rest repulsive."""
    if offsets is None:
        offsets = shift_func(affs.shape[0])
    offs = np.ascontiguousarray(np.asarray(offsets, np.int32))
    af = np.ascontiguousarray(affs.astype(np.float32))
    z, y, x = affs.shape[1:]
    out = np.empty((z, y, x), np.uint64)
    native.lib().mutex_watershed(
        native._ptr(af, native.ctypes.c_float),
        native._ptr(offs, native.ctypes.c_int32),
        int(affs.shape[0]), int(n_attractive), z, y, x,
        native._ptr(out, native.ctypes.c_uint64))
    return out
