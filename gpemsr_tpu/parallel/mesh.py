"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL DDP stack (train_stage1.py:18-25,131-134).

One SPMD program over a ('data', 'spatial') mesh:
  * 'data'    — batch sharding; XLA inserts the gradient psum that DDP's
                allreduce performed, riding ICI.
  * 'spatial' — optional sharding of image H for full-section inference
                (the workload's analog of sequence parallelism, SURVEY §5.7).
No barriers, no reduce-to-rank-0: metrics come out replicated."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ensure_cpu_devices(n: int) -> None:
    """Force a clean n-device CPU JAX, even if another backend (e.g. this
    container's eagerly-registered TPU plugin) already initialised. Safe to
    call multiple times; no-op if already satisfied."""
    import jax
    from jax._src import xla_bridge as xb

    # Probe only ALREADY-INITIALIZED backends: jax.devices() on a fresh
    # process would instantiate the default backend — the eagerly-registered
    # TPU plugin — whose client creation blocks on the remote tunnel (and
    # hangs indefinitely when the tunnel is down, observed 2026-08-17).
    if xb._backends:
        devs = jax.devices()
        if devs[0].platform == "cpu" and len(devs) >= n:
            return
    xb._clear_backends()
    xb.get_backend.cache_clear()       # _clear_backends misses this memo
    try:
        jax.config.update("jax_num_cpu_devices", n)
    except RuntimeError:
        pass
    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= n, (
        f"could not provision {n} CPU devices (have {len(jax.devices())})")


def make_mesh(data: int = -1, spatial: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        data = n // spatial
    assert data * spatial <= n, f"mesh {data}x{spatial} exceeds {n} devices"
    dev = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(dev, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh):
    """Device-put a host batch with axis-0 sharded over the data axis."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def host_shard_batch(batch: Any, mesh: Mesh):
    """Assemble the global batch from this host's local shard. Single-process:
    plain sharded device_put. Multi-host SPMD: every host loads its
    1/process_count of the global batch (the reference's per-rank
    batch_size//world_size split, data/__init__.py:13-14) and the global
    array is formed from the process-local data."""
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch)


def replicate(tree: Any, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)


def production_mesh(parallel_cfg, global_batch: int | None = None) -> Mesh:
    """Build the training mesh from ParallelConfig: data=-1 means all
    (remaining) devices on the data axis — the out-of-the-box analog of the
    reference's one-process-per-GPU DDP default (train_stage1.py:18-25).

    With data=-1 and a `global_batch`, the data axis is clamped to the
    largest divisor of the batch (a batch-2 debug run on an 8-chip host gets
    a 2-wide mesh instead of an error). An explicitly requested data size is
    honored verbatim — the caller validates divisibility."""
    n = len(jax.devices())
    spatial = max(1, parallel_cfg.spatial)
    if parallel_cfg.data > 0:
        data = parallel_cfg.data
    else:
        data = max(1, n // spatial)
        if global_batch is not None:
            while global_batch % data:
                data -= 1
    return make_mesh(data=data, spatial=spatial)
