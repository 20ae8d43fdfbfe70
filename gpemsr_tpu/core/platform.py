"""Platform selection helper for CLI entry points.

This container's sitecustomize eagerly initialises a TPU PJRT client; when the
user wants CPU (GPEMSR_FORCE_CPU=<n_devices>), the backend must be rebuilt
in-process (JAX_PLATFORMS=cpu alone leaves the half-initialised TPU client
wedging compiles)."""

from __future__ import annotations

import os


def init_platform():
    force = os.environ.get("GPEMSR_FORCE_CPU")
    if force:
        from gpemsr_tpu.parallel.mesh import ensure_cpu_devices
        ensure_cpu_devices(max(1, int(force)))
