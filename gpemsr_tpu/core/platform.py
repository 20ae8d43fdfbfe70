"""Platform selection helper for CLI entry points.

This container's sitecustomize eagerly initialises a TPU PJRT client; when the
user wants CPU (GPEMSR_FORCE_CPU=<n_devices>), the backend must be rebuilt
in-process (JAX_PLATFORMS=cpu alone leaves the half-initialised TPU client
wedging compiles)."""

from __future__ import annotations

import os


def init_platform():
    force = os.environ.get("GPEMSR_FORCE_CPU")
    coord = os.environ.get("JAX_COORDINATOR")
    if force:
        if coord:
            # multi-process CPU run: configure the CPU platform WITHOUT
            # initializing a backend — jax.distributed.initialize below must
            # run before the first jax.devices() so every process contributes
            # its local CPU devices to the global mesh.
            import jax
            from jax._src import xla_bridge as xb
            xb._clear_backends()
            xb.get_backend.cache_clear()
            try:
                jax.config.update("jax_num_cpu_devices", max(1, int(force)))
            except RuntimeError:
                pass
            jax.config.update("jax_platforms", "cpu")
        else:
            from gpemsr_tpu.parallel.mesh import ensure_cpu_devices
            ensure_cpu_devices(max(1, int(force)))
    # multi-host SPMD: every host runs the same program; the coordinator
    # address forms the global mesh (the reference's dist.init_process_group
    # 'env://' role, train_stage1.py:18-25). Process id/count come from
    # GPEMSR_HOST_ID / GPEMSR_HOST_COUNT or the cluster env JAX autodetects.
    if coord:
        import jax
        kwargs = {"coordinator_address": coord}
        hid = os.environ.get("GPEMSR_HOST_ID")
        hcount = os.environ.get("GPEMSR_HOST_COUNT")
        if (hid is None) != (hcount is None):
            raise ValueError(
                "GPEMSR_HOST_ID and GPEMSR_HOST_COUNT must be set together "
                f"(got GPEMSR_HOST_ID={hid!r}, GPEMSR_HOST_COUNT={hcount!r})")
        if hid is not None:
            kwargs["process_id"] = int(hid)
            kwargs["num_processes"] = int(hcount)
        jax.distributed.initialize(**kwargs)
    # persistent compilation cache (large graphs compile in minutes over
    # remote-compile tunnels; cache hits make restarts cheap)
    cache = os.environ.get(
        "GPEMSR_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if coord:
        _warmup_collectives()


def _warmup_collectives():
    """Establish the cross-process collective context while processes are
    aligned.

    Gloo (the CPU cross-process collectives backend) performs its rendezvous
    with a hard-coded ~30 s key-value timeout the first time a communicator
    is used. If that first use sits inside the first jitted train step, the
    rendezvous races each process's multi-minute independent compile and
    times out whenever processes skew by >30 s (observed under CPU
    contention). So: a coordination-service barrier (generous timeout, no
    Gloo involved) aligns the processes, then a trivial all-device psum —
    compiled in seconds — creates the all-devices communicator back-to-back
    on every process. Subsequent collectives over the same device set (the
    data-axis psum every train step issues) reuse it, and the blocking fetch
    leaves all processes in lockstep."""
    import jax
    import numpy as np
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None or jax.process_count() == 1:
        return
    client.wait_at_barrier("gpemsr_warmup", 1_800_000)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("d",))

    @jax.jit
    def _allsum(x):
        return jnp.sum(x)

    x = jax.device_put(
        jnp.ones((len(devs),), jnp.float32),
        NamedSharding(mesh, PartitionSpec("d")))
    total = float(_allsum(x))
    assert total == len(devs), total
