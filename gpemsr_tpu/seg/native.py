"""ctypes bindings for the native segmentation core (cpp/emseg.cc).

Auto-builds libemseg.so with g++ on first use if the binary is missing or
stale (the reference shipped these as the mahotas/waterz wheels)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")
_SRC = os.path.abspath(os.path.join(_CPP_DIR, "emseg.cc"))
_SO = os.path.abspath(os.path.join(_CPP_DIR, "libemseg.so"))

_lib = None


def _build():
    subprocess.run(["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                   check=True)


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        if (not os.path.exists(_SO)) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        _lib = ctypes.CDLL(_SO)
        C = ctypes
        _lib.edt2d_sq.argtypes = [C.POINTER(C.c_uint8), C.c_int, C.c_int,
                                  C.POINTER(C.c_float)]
        _lib.label2d.argtypes = [C.POINTER(C.c_uint8), C.c_int, C.c_int,
                                 C.c_int, C.POINTER(C.c_int32)]
        _lib.label2d.restype = C.c_int
        _lib.regmax2d.argtypes = [C.POINTER(C.c_float), C.c_int, C.c_int,
                                  C.c_int, C.POINTER(C.c_uint8)]
        _lib.cwatershed2d.argtypes = [C.POINTER(C.c_float), C.POINTER(C.c_int32),
                                      C.c_int, C.c_int, C.c_int,
                                      C.POINTER(C.c_int32)]
        _lib.agglomerate.argtypes = [C.POINTER(C.c_uint64), C.POINTER(C.c_float),
                                     C.c_int, C.c_int, C.c_int, C.c_float,
                                     C.c_int, C.c_int, C.c_float,
                                     C.POINTER(C.c_uint64)]
        _lib.malis_weights.argtypes = [C.POINTER(C.c_float), C.POINTER(C.c_uint32),
                                       C.c_int, C.c_int, C.c_int, C.c_int,
                                       C.POINTER(C.c_float)]
        _lib.mutex_watershed.argtypes = [C.POINTER(C.c_float), C.POINTER(C.c_int32),
                                         C.c_int, C.c_int, C.c_int, C.c_int,
                                         C.c_int, C.POINTER(C.c_uint64)]
    return _lib


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def edt2d_sq(mask: np.ndarray) -> np.ndarray:
    """Squared Euclidean distance of nonzero pixels to the nearest zero
    (mahotas.distance default metric)."""
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    out = np.empty((h, w), np.float32)
    lib().edt2d_sq(_ptr(m, ctypes.c_uint8), h, w, _ptr(out, ctypes.c_float))
    return out


def label2d(mask: np.ndarray, conn: int = 4):
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    out = np.empty((h, w), np.int32)
    n = lib().label2d(_ptr(m, ctypes.c_uint8), h, w, conn,
                      _ptr(out, ctypes.c_int32))
    return out, int(n)


def regmax2d(img: np.ndarray, conn: int = 4) -> np.ndarray:
    f = np.ascontiguousarray(img.astype(np.float32))
    h, w = f.shape
    out = np.empty((h, w), np.uint8)
    lib().regmax2d(_ptr(f, ctypes.c_float), h, w, conn,
                   _ptr(out, ctypes.c_uint8))
    return out.astype(bool)


def cwatershed2d(surface: np.ndarray, markers: np.ndarray,
                 conn: int = 4) -> np.ndarray:
    s = np.ascontiguousarray(surface.astype(np.float32))
    m = np.ascontiguousarray(markers.astype(np.int32))
    h, w = s.shape
    out = np.empty((h, w), np.int32)
    lib().cwatershed2d(_ptr(s, ctypes.c_float), _ptr(m, ctypes.c_int32),
                       h, w, conn, _ptr(out, ctypes.c_int32))
    return out


def malis_weights(affs: np.ndarray, seg: np.ndarray, pos: bool) -> np.ndarray:
    """MALIS maximin pair counts per edge (em_segLib.seg_malis role,
    reference utils/malis_loss.py:5-14). affs [3,Z,Y,X], seg [Z,Y,X]."""
    af = np.ascontiguousarray(affs.astype(np.float32))
    sg = np.ascontiguousarray(seg.astype(np.uint32))
    z, y, x = sg.shape
    out = np.empty_like(af)
    lib().malis_weights(_ptr(af, ctypes.c_float), _ptr(sg, ctypes.c_uint32),
                        z, y, x, int(pos), _ptr(out, ctypes.c_float))
    return out


#: waterz scoring-function surface (inference_seg.py:149-153 selects these by
#: C++ template string; we accept the short name or the full template string).
_SCORERS = {"mean": 0, "max": 1, "min": 2, "quantile": 3}
_TEMPLATE_SCORERS = {
    "MeanAffinity": "mean", "MaxAffinity": "max", "MinAffinity": "min",
    "QuantileAffinity": "quantile",
}


def parse_scoring_function(name: str) -> tuple[int, float]:
    """Map a scorer spec to (scorer_id, quantile). Accepts short names
    ('mean', 'max', 'min', 'quantile:75') or waterz template strings
    ('OneMinus<EdgeStatisticValue<RegionGraphType, MeanAffinityProvider<...'
    — the reference's selection surface, inference_seg.py:149)."""
    s = name.strip()
    q = 50.0
    for frag, short in _TEMPLATE_SCORERS.items():
        if frag in s:
            if short == "quantile":
                import re
                m = re.search(r"QuantileAffinity\w*<[^,>]*,\s*(\d+)", s)
                if m:
                    q = float(m.group(1))
            return _SCORERS[short], q
    if ":" in s:
        s, qs = s.split(":", 1)
        q = float(qs)
    if s not in _SCORERS:
        raise ValueError(f"unknown scoring function {name!r}; expected one of "
                         f"{sorted(_SCORERS)} or a waterz template string")
    return _SCORERS[s], q


def agglomerate(fragments: np.ndarray, affs: np.ndarray,
                threshold: float = 0.5, bins: int = 256,
                scoring_function: str = "mean") -> np.ndarray:
    """waterz-style region-graph agglomeration.

    fragments [Z,Y,X] uint64, affs [3,Z,Y,X] float32 (z,y,x channels).
    scoring_function: 'mean' (default) | 'max' | 'min' | 'quantile:<q>' or a
    waterz template string."""
    scorer, quantile = parse_scoring_function(scoring_function)
    fr = np.ascontiguousarray(fragments.astype(np.uint64))
    af = np.ascontiguousarray(affs.astype(np.float32))
    z, y, x = fr.shape
    out = np.empty_like(fr)
    lib().agglomerate(_ptr(fr, ctypes.c_uint64), _ptr(af, ctypes.c_float),
                      z, y, x, ctypes.c_float(threshold), bins,
                      scorer, ctypes.c_float(quantile),
                      _ptr(out, ctypes.c_uint64))
    return out
