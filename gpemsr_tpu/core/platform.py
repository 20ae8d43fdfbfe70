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
