"""Single-file packed image store — the lmdb role of the reference data
layer (data/util.py:35-42,64-72), TPU-idiomatic: one sequentially-readable
file per dataset instead of 10^5 small PNGs, so per-host input pipelines
stream instead of seeking. Unlike lmdb there is no native dependency.

Format (zip-central-directory style, append-friendly to write):

    [blob 0][blob 1]...[index JSON][u64 index_size][8-byte magic]

The index maps relative POSIX paths ("vol0/s0/0000.png") to (offset, size).
Blobs are the original encoded image bytes (PNG), decoded on read.

`PackFS` / `TreeFS` expose the tiny filesystem surface the datasets need
(listdir / exists / read_img), selected by `get_fs(root)`: a root ending in
`.pack` reads from the pack, anything else from the directory tree.
"""

from __future__ import annotations

import json
import os
import posixpath
import struct
import threading

import numpy as np

MAGIC = b"EMPACK01"


class _ImgCache:
    """Byte-bounded FIFO cache of decoded images, shared by all FS instances.

    EM SR training rereads a small set of sections constantly (the ratio-200
    epoch-enlarged sampler draws the same slices thousands of times,
    data/data_sampler.py:7-60 semantics), so PNG decode dominates host time
    on small-core hosts. Cached arrays are returned read-only; every dataset
    consumer crops/flips via views and copies with ascontiguousarray before
    mutation. Bound via GPEMSR_IMG_CACHE_MB (0 disables)."""

    def __init__(self, max_bytes: int):
        self.max_bytes = max_bytes
        self._d: dict[str, np.ndarray] = {}
        self._bytes = 0
        self._lock = threading.Lock()

    def get(self, key: str):
        with self._lock:
            return self._d.get(key)

    def put(self, key: str, arr: np.ndarray):
        if arr.nbytes > self.max_bytes:
            return
        arr.setflags(write=False)
        with self._lock:
            if key in self._d:
                return
            while self._bytes + arr.nbytes > self.max_bytes and self._d:
                old = self._d.pop(next(iter(self._d)))   # oldest entry
                self._bytes -= old.nbytes
            self._d[key] = arr
            self._bytes += arr.nbytes


_img_cache = _ImgCache(
    int(float(os.environ.get("GPEMSR_IMG_CACHE_MB", "512")) * 1e6))


def write_pack(src_root: str, pack_path: str,
               exts: tuple[str, ...] = (".png",)) -> int:
    """Pack every `exts` file under src_root (keys = relative POSIX paths).
    Returns the number of entries."""
    index: dict[str, tuple[int, int]] = {}
    with open(pack_path, "wb") as out:
        for dirpath, _dirnames, filenames in sorted(os.walk(src_root)):
            rel_dir = os.path.relpath(dirpath, src_root)
            for fn in sorted(filenames):
                if not fn.lower().endswith(exts):
                    continue
                rel = fn if rel_dir == "." else posixpath.join(
                    *rel_dir.split(os.sep), fn)
                with open(os.path.join(dirpath, fn), "rb") as f:
                    blob = f.read()
                index[rel] = (out.tell(), len(blob))
                out.write(blob)
        blob = json.dumps(index).encode()
        out.write(blob)
        out.write(struct.pack("<Q", len(blob)))
        out.write(MAGIC)
    return len(index)


class Pack:
    """Read-only view of a pack file. Thread-safe via pread-style reads."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            f.seek(-16, os.SEEK_END)
            size_raw = f.read(8)
            magic = f.read(8)
            if magic != MAGIC:
                raise ValueError(f"{path}: not a pack file (bad magic)")
            (idx_size,) = struct.unpack("<Q", size_raw)
            f.seek(-(16 + idx_size), os.SEEK_END)
            self.index: dict[str, list[int]] = json.loads(f.read(idx_size))
        self._fd = os.open(path, os.O_RDONLY)
        # directory view: parent -> sorted child names (dirs and files)
        children: dict[str, set] = {}
        for key in self.index:
            parts = key.split("/")
            for d in range(len(parts)):
                parent = "/".join(parts[:d])
                children.setdefault(parent, set()).add(parts[d])
        self._children = {k: sorted(v) for k, v in children.items()}

    def __del__(self):
        try:
            os.close(self._fd)
        except Exception:
            pass

    def read(self, rel: str) -> bytes:
        off, size = self.index[rel]
        return os.pread(self._fd, size, off)

    def exists(self, rel: str) -> bool:
        return rel in self.index or rel in self._children

    def listdir(self, rel: str = "") -> list[str]:
        rel = rel.strip("/")
        if rel not in self._children:
            raise FileNotFoundError(f"{self.path}:{rel}")
        return self._children[rel]


class TreeFS:
    """Directory-tree backend (the reference's data_type='img' path)."""

    def __init__(self, root: str):
        self.root = root

    def _p(self, rel: str) -> str:
        return os.path.join(self.root, *rel.split("/")) if rel else self.root

    def listdir(self, rel: str = "") -> list[str]:
        return sorted(os.listdir(self._p(rel)))

    def exists(self, rel: str) -> bool:
        return os.path.exists(self._p(rel))

    def read_img(self, rel: str) -> np.ndarray:
        from gpemsr_tpu.utils.image import read_img
        key = f"{self.root}::{rel}"
        img = _img_cache.get(key)
        if img is None:
            img = read_img(self._p(rel))
            _img_cache.put(key, img)
        return img


class PackFS:
    """Pack-file backend (the reference's data_type='lmdb' path)."""

    def __init__(self, path: str):
        self.pack = Pack(path)

    def listdir(self, rel: str = "") -> list[str]:
        return self.pack.listdir(rel)

    def exists(self, rel: str) -> bool:
        return self.pack.exists(rel)

    def read_img(self, rel: str) -> np.ndarray:
        import io

        from PIL import Image

        from gpemsr_tpu.utils.image import to_float_img
        key = f"{self.pack.path}::{rel}"
        img = _img_cache.get(key)
        if img is None:
            img = to_float_img(np.asarray(Image.open(
                io.BytesIO(self.pack.read(rel)))))
            _img_cache.put(key, img)
        return img


def get_fs(root: str):
    return PackFS(root) if root.endswith(".pack") else TreeFS(root)
