"""Frame-window index generation for multi-frame SR.

Capability parity with reference data/util.py:111-157 `index_generation`:
given a center index and stack length, produce the N-frame window under one of
four boundary-padding modes."""

from __future__ import annotations


def index_generation(crt_i: int, max_n: int, n_frames: int,
                     padding: str = "reflection") -> list[int]:
    """max_n: total frame count (indices 0..max_n-1); N must be odd."""
    assert n_frames % 2 == 1, "n_frames must be odd"
    half = n_frames // 2
    out = []
    for i in range(crt_i - half, crt_i + half + 1):
        if i < 0:
            if padding == "replicate":
                j = 0
            elif padding == "reflection":
                j = -i
            elif padding == "new_info":
                j = crt_i + half - i       # borrow from the future side
            elif padding == "circle":
                j = n_frames + i
            else:
                raise ValueError(f"unknown padding {padding}")
        elif i > max_n - 1:
            if padding == "replicate":
                j = max_n - 1
            elif padding == "reflection":
                j = 2 * (max_n - 1) - i
            elif padding == "new_info":
                j = (crt_i - half) - (i - (max_n - 1))
            elif padding == "circle":
                j = i - n_frames
            else:
                raise ValueError(f"unknown padding {padding}")
        else:
            j = i
        out.append(j)
    return out
