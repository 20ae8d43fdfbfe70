"""Spatially-sharded full-section SR inference.

The workload's analog of sequence parallelism (SURVEY §5.7): a full
1024x1024 section (64x64 LR x 5 frames) is split into overlapping LR tiles
along H, one tile per device on the mesh's 'spatial' axis; each device runs
the full GPEMSR forward on its tile and the valid centers are concatenated.
Halo = receptive margin in LR pixels; with stride-1 convs and the x16
in-network upsampling, 8 LR pixels of halo cover the alignment pyramid's
receptive field comfortably.

This is pure SPMD: one pjit, no collectives except the final all-gather XLA
inserts for the output concatenation."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pad_to_tiles(lr_stack: jnp.ndarray, n_tiles: int, halo: int):
    """[B, N, H, W, C] -> [B, n_tiles, N, tile_h + 2*halo, W, C] with
    reflect padding at the stack borders."""
    B, N, H, W, C = lr_stack.shape
    assert H % n_tiles == 0, f"H={H} not divisible by {n_tiles} tiles"
    th = H // n_tiles
    padded = jnp.pad(lr_stack, ((0, 0), (0, 0), (halo, halo), (0, 0), (0, 0)),
                     mode="reflect")
    tiles = [padded[:, :, i * th: i * th + th + 2 * halo] for i in range(n_tiles)]
    return jnp.stack(tiles, axis=1)          # [B, T, N, th+2h, W, C]


def spatial_sr(model, params, lr_stack: np.ndarray, mesh: Mesh,
               halo: int = 8, scale: int = 16):
    """Run one 5-frame window over the 'spatial' mesh axis.

    lr_stack: [1, N, H, W, 1]; returns [1, H*scale, W*scale, 1]."""
    n_tiles = mesh.shape["spatial"]
    x = jnp.asarray(lr_stack)
    tiles = pad_to_tiles(x, n_tiles, halo)   # [1, T, N, th+2h, W, 1]

    tile_sharding = NamedSharding(mesh, P(None, "spatial"))
    rep = NamedSharding(mesh, P())
    tiles = jax.device_put(tiles, tile_sharding)
    params = jax.device_put(params, rep)

    @jax.jit
    def run(params, tiles):
        def per_tile(tile):                  # [N, th+2h, W, 1]
            sr, _ = model.apply(params, tile[None])
            lo = halo * scale
            hi = sr.shape[1] - halo * scale
            return sr[0, lo:hi]              # valid center [th*s, W*s, 1]

        # vmap over the tile axis; sharded inputs keep each tile on its device
        out = jax.vmap(per_tile)(tiles[0])   # [T, th*s, W*s, 1]
        return out.reshape(1, -1, out.shape[2], out.shape[3])

    return run(params, tiles)
