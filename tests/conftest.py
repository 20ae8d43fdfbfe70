"""Test harness: run everything on CPU with 8 virtual devices so multi-chip
sharding paths (pjit over a Mesh) are exercised without TPU hardware.

This container's sitecustomize eagerly registers a TPU PJRT plugin and
initialises the JAX backend (pinning the CPU client to 1 device and routing
compiles through a remote tunnel), so we clear the backends and rebuild a
clean 8-device CPU JAX before any test imports."""

import jax
from jax._src import xla_bridge as _xb

_xb._clear_backends()
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")
# golden tests compare against torch fp32 oracles
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
