"""Tiled 3-D affinity inference with Gaussian overlap blending.

Capability parity with reference inference_code/data/provider_valid.py:18-311,
re-designed device-side: the padded volume lives in HBM once, each crop is a
dynamic_slice, the model runs on it, and a jitted accumulate step adds
pred*weight into the running sums — no host round-trips per crop (the
reference moves every prediction through numpy).

Protocol constants (superhuman): crop [18,160,160], stride [10,80,80],
reflect pad [4,48,48], Gaussian sigma 0.2 blending; (MALA): crop
[53,268,268], valid-conv margin [14,106,106], outputs written unblended.
The reference enumerates crops with its y/x axes swapped consistently
(provider_valid.py:200-201,276-281); the grids are symmetric so the resulting
field is identical."""

from __future__ import annotations

import functools

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class TileProtocol:
    crop: tuple[int, int, int]
    stride: tuple[int, int, int]
    pad: tuple[int, int, int]                     # reflect padding per side
    net_crop: tuple[int, int, int] = (0, 0, 0)    # output shrink per side (MALA)
    blend: bool = True

    @classmethod
    def superhuman(cls):
        return cls(crop=(18, 160, 160), stride=(10, 80, 80), pad=(4, 48, 48))

    @classmethod
    def mala(cls):
        return cls(crop=(53, 268, 268), stride=(25, 56, 56), pad=(14, 106, 106),
                   net_crop=(14, 106, 106), blend=False)

    def out_size(self):
        return tuple(self.crop[i] - 2 * self.net_crop[i] for i in range(3))

    def positions(self, padded_shape):
        """Crop-origin grid over the padded volume, clamped at the far edge
        (provider_valid.py:174-198)."""
        axes = []
        for d in range(3):
            axis = []
            p = 0
            while True:
                if p + self.crop[d] >= padded_shape[d]:
                    axis.append(padded_shape[d] - self.crop[d])
                    break
                axis.append(p)
                p += self.stride[d]
            axes.append(axis)
        return [(z, y, x) for z in axes[0] for y in axes[1] for x in axes[2]]


def gaussian_weight(out_size, sigma: float = 0.2) -> np.ndarray:
    """Radial Gaussian blending weight over the output crop
    (provider_valid.py:256-268)."""
    zz, yy, xx = np.meshgrid(
        *[np.linspace(-1, 1, s, dtype=np.float32) for s in out_size],
        indexing="ij")
    dd = np.sqrt(zz * zz + yy * yy + xx * xx)
    return 1e-6 + np.exp(-(dd ** 2) / (2.0 * sigma ** 2))


def _fold_axis(a, gdim: int, stride: int):
    """Overlap-add along one grid axis.

    a: [..., G, 2, S, ...] with the grid axis at `gdim` and the (2, S) block
    split right after it. Returns [..., G+1, S, ...]:
      out[0] = a[0, 0]; out[g] = a[g, 0] + a[g-1, 1]; out[G] = a[G-1, 1]."""
    a0 = a[(slice(None),) * gdim + (slice(None), 0)]
    a1 = a[(slice(None),) * gdim + (slice(None), 1)]
    zpad = [(0, 0)] * a0.ndim
    zpad[gdim] = (0, 1)
    lead = jnp.pad(a0, zpad)
    zpad[gdim] = (1, 0)
    return lead + jnp.pad(a1, zpad)


def _regular_grid(padded_shape, proto: TileProtocol):
    """Grid dims if the crop grid tiles the padded volume exactly with
    crop <= 2*stride on every axis (the superhuman protocol does), else None."""
    dims = []
    for d in range(3):
        size, c, s = padded_shape[d], proto.crop[d], proto.stride[d]
        if c > 2 * s or (size - c) % s != 0:
            return None
        dims.append((size - c) // s + 1)
    return tuple(dims)


def tiled_infer(apply_fn: Callable, volume: np.ndarray, proto: TileProtocol,
                out_channels: int = 3, batch: int = 4,
                params=None, fetch_dtype=None, fetch_boundary: bool = False):
    """volume [Z, Y, X] float32 in [0,1] -> affinities [C, Z, Y, X].

    apply_fn(crop[B, cz, cy, cx, 1]) -> [B, oz, oy, ox, C]. Crops are batched
    (`batch` per device step) so the MXU sees wide convolutions; the
    accumulation scatter runs inside the same jit.

    params: optional variables passed as a REAL jit argument, with
    apply_fn(params, crop). Without it, closure weights serialize into the
    compiled graph as constants — fine for small nets, but MALA's ~84M
    params exceed this environment's remote-compile request limit
    (HTTP 413). Prefer passing params for big models.

    fetch_dtype: optional narrower dtype the normalized affinities are cast
    to ON DEVICE before the device->host fetch (the dominant cost on
    low-bandwidth links; a 50x1024^2 f32 volume is ~845 MB).
      * np.float16 halves the bytes and keeps ~5e-4 resolution near 1.0;
        measured VOI delta -0.012 (noise).
      * np.uint8 quarters them (round(a*255)). u8 is fine for the waterz
        agglomeration scores (its merge queue is already discretized into
        256 bins) but too coarse for the watershed boundary map, whose
        seeds it measurably shifts — pair with fetch_boundary=True.
    The returned affinities are float32 either way.

    fetch_boundary: also compute the watershed boundary map
    1 - 0.5*(affs[1] + affs[2]) ON DEVICE from the pre-quantization f32
    affinities and fetch it as f16 (+2 bytes/voxel); the return value
    becomes (affs, boundary) with boundary float32 [Z, Y, X]. Pass it to
    `watershed(..., boundary=...)` so seed geometry keeps f16 precision
    while the affinities ride the u8 path."""
    if params is not None:
        inner_apply = apply_fn
    else:
        def inner_apply(_p, crops):
            return apply_fn(crops)
    def fetch(dev_arr):
        bdry = None
        if fetch_boundary:
            b16 = (1.0 - 0.5 * (dev_arr[1] + dev_arr[2])).astype(jnp.float16)
            bdry = np.asarray(b16).astype(np.float32)
        if fetch_dtype is np.uint8 or fetch_dtype == jnp.uint8:
            q = jnp.clip(jnp.round(dev_arr * 255.0), 0, 255).astype(jnp.uint8)
            out = np.asarray(q).astype(np.float32) / 255.0
        elif fetch_dtype is not None:
            out = np.asarray(dev_arr.astype(fetch_dtype)).astype(np.float32)
        else:
            out = np.asarray(dev_arr).astype(np.float32)
        return (out, bdry) if fetch_boundary else out

    pad = proto.pad
    padded = np.pad(volume, tuple((p, p) for p in pad), mode="reflect")
    out_size = proto.out_size()
    positions = proto.positions(padded.shape)

    vol_dev = jnp.asarray(padded)
    w = jnp.asarray(gaussian_weight(out_size))
    cz, cy, cx = proto.crop

    # batch the position grid, padding the tail (weight 0)
    n = len(positions)
    nb = -(-n // batch)
    pos_np = np.asarray(positions + [positions[-1]] * (nb * batch - n),
                        np.int32).reshape(nb, batch, 3)
    valid_np = np.zeros((nb, batch), np.float32)
    valid_np.reshape(-1)[:n] = 1.0

    grid = _regular_grid(padded.shape, proto) if proto.blend else None
    if grid is not None:
        # Dense overlap-add ("fold"): on a regular grid every output voxel is
        # covered by exactly <=2 crops per axis, so the Gaussian-blend
        # accumulation is three padded adds — no dynamic scatter at all
        # (profiled: the scatter path cost ~0.5s/step on TPU).
        gz, gy, gx = grid
        sz, sy, sx = proto.stride

        # per-z-row position packing: [gz, nb_row, batch, 3]
        row_n = gy * gx
        nb_row = -(-row_n // batch)
        rows_pos = np.zeros((gz, nb_row * batch, 3), np.int32)
        rows_val = np.zeros((gz, nb_row * batch), np.float32)
        pos_grid = np.asarray(positions, np.int32).reshape(gz, row_n, 3)
        rows_pos[:, :row_n] = pos_grid
        rows_pos[:, row_n:] = pos_grid[:, -1:]
        rows_val[:, :row_n] = 1.0
        rows_pos = rows_pos.reshape(gz, nb_row, batch, 3)
        rows_val = rows_val.reshape(gz, nb_row, batch)

        def fold_yx(preds_row, nc):
            """[gy*gx, oz, oy, ox, nc] -> [2*sz(z-padded crop), (gy+1)*sy,
            (gx+1)*sx, nc]; y/x folded, z kept as the padded crop."""
            a = preds_row.reshape((gy, gx) + tuple(out_size) + (nc,))
            a = jnp.pad(a, ((0, 0), (0, 0), (0, 2 * sz - cz),
                            (0, 2 * sy - cy), (0, 2 * sx - cx), (0, 0)))
            a = a.reshape(gy, gx, 2 * sz, 2, sy, 2, sx, nc)
            a = a.transpose(2, 0, 3, 4, 1, 5, 6, 7)
            # [2sz, gy, 2, sy, gx, 2, sx, nc]
            a = _fold_axis(a, 1, sy)
            a = _fold_axis(a, 3, sx)
            return a.reshape(2 * sz, (gy + 1) * sy, (gx + 1) * sx, nc)

        @jax.jit
        def run_fold(prm, vol, rows_pos, rows_val):
            def one_row(inp):
                pos_r, val_r = inp

                def one_batch(binp):
                    pos_b, val_b = binp
                    crops = jax.vmap(lambda p: jax.lax.dynamic_slice(
                        vol, tuple(p), (cz, cy, cx)))(pos_b)
                    preds = inner_apply(prm, crops[..., None])
                    return preds * (w[None, ..., None] *
                                    val_b[:, None, None, None, None])

                pr = jax.lax.map(one_batch, (pos_r, val_r))
                pr = pr.reshape((nb_row * batch,) + tuple(out_size)
                                + (out_channels,))[:row_n]
                return fold_yx(pr, out_channels)

            rows = jax.lax.map(one_row, (rows_pos, rows_val))
            # final z fold over the row axis: [gz, 2, sz, Y, X, C]
            a = rows.reshape(gz, 2, sz, rows.shape[2], rows.shape[3],
                             out_channels)
            a = _fold_axis(a, 0, sz)
            return a.reshape((gz + 1) * sz, rows.shape[2], rows.shape[3],
                             out_channels).transpose(3, 0, 1, 2)

        @jax.jit
        def run_wfold():
            wt = jnp.broadcast_to(w[None], (row_n,) + tuple(out_size))[..., None]
            row = fold_yx(wt, 1)
            a = jnp.broadcast_to(row[None], (gz,) + row.shape)
            a = a.reshape(gz, 2, sz, row.shape[1], row.shape[2], 1)
            a = _fold_axis(a, 0, sz)
            return a.reshape((gz + 1) * sz, row.shape[1], row.shape[2], 1
                             ).transpose(3, 0, 1, 2)

        acc = run_fold(params, vol_dev, jnp.asarray(rows_pos),
                       jnp.asarray(rows_val))
        wacc = run_wfold()
        res = fetch(acc / wacc)

        def trim(a):
            # trim the fold's zero tail back to the padded volume, then unpad
            a = a[..., :padded.shape[0], :padded.shape[1], :padded.shape[2]]
            return a[..., pad[0]:a.shape[-3] - pad[0],
                     pad[1]:a.shape[-2] - pad[1],
                     pad[2]:a.shape[-1] - pad[2]]

        if fetch_boundary:
            return trim(res[0]), trim(res[1])
        return trim(res)

    if proto.blend:
        # per-batch dispatch with DONATED accumulators: the 4-buffer
        # (acc+wacc ~1GB) would otherwise be copied every step — donation
        # makes the scatter-add genuinely in-place on device
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(acc, wacc, prm, vol, pos_b, val_b):
            crops = jax.vmap(lambda p: jax.lax.dynamic_slice(
                vol, tuple(p), (cz, cy, cx)))(pos_b)
            preds = inner_apply(prm, crops[..., None])   # [B, oz, oy, ox, C]

            def add_one(carry, inp):
                acc, wacc = carry
                pred, pos, v = inp
                pred = pred.transpose(3, 0, 1, 2) * (w * v)
                t = (jnp.int32(0),) + tuple(pos)
                cur = jax.lax.dynamic_slice(acc, t, (out_channels,) + out_size)
                acc = jax.lax.dynamic_update_slice(acc, cur + pred, t)
                curw = jax.lax.dynamic_slice(wacc, tuple(pos), out_size)
                wacc = jax.lax.dynamic_update_slice(wacc, curw + w * v,
                                                    tuple(pos))
                return (acc, wacc), None

            (acc, wacc), _ = jax.lax.scan(add_one, (acc, wacc),
                                          (preds, pos_b, val_b))
            return acc, wacc

        acc = jnp.zeros((out_channels,) + padded.shape, jnp.float32)
        wacc = jnp.zeros(padded.shape, jnp.float32)
        pos_dev = jnp.asarray(pos_np)
        val_dev = jnp.asarray(valid_np)
        for i in range(nb):
            acc, wacc = step(acc, wacc, params, vol_dev, pos_dev[i],
                             val_dev[i])
        res = fetch(acc / wacc[None])

        def trim(a):
            return a[..., pad[0]:a.shape[-3] - pad[0],
                     pad[1]:a.shape[-2] - pad[1],
                     pad[2]:a.shape[-1] - pad[2]]

        if fetch_boundary:
            return trim(res[0]), trim(res[1])
        return trim(res)

    # MALA: valid-conv output maps exactly onto the unpadded volume at the
    # crop origin; crops are written without blending (provider_valid.py:283)
    @jax.jit
    def run_mala(prm, vol, pos_arr):
        acc0 = jnp.zeros((out_channels,) + volume.shape, jnp.float32)

        def outer(acc, pos_b):
            def one(acc, pos):
                crop = jax.lax.dynamic_slice(vol, tuple(pos), (cz, cy, cx))
                pred = inner_apply(
                    prm, crop[None, ..., None])[0].transpose(3, 0, 1, 2)
                return jax.lax.dynamic_update_slice(
                    acc, pred, (jnp.int32(0),) + tuple(pos)), None

            acc, _ = jax.lax.scan(one, acc, pos_b)
            return acc, None

        acc, _ = jax.lax.scan(outer, acc0, pos_arr)
        return acc

    # unpadded writes happen in grid order; tail padding rewrites the last
    # crop (identical output, provider semantics)
    return fetch(run_mala(params, vol_dev, jnp.asarray(pos_np)))   # no pad
