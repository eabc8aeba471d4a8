"""Test configuration: force CPU platform with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh (the standard JAX
pattern for testing TPU sharding logic without TPU hardware).

Note: this environment's sitecustomize registers a remote TPU backend and
sets jax_platforms via the config API at interpreter start, so overriding
the JAX_PLATFORMS env var is not enough — we must update the config after
importing jax, before any backend initializes.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _clear_kernel_mesh():
    """Isolate the process-global Pallas kernel-mesh registration
    (ops/pallas/partition.py): tests that build mesh-sharded steps register
    a mesh there, which would otherwise leak shard_map wrapping into later
    single-device kernel tests."""
    yield
    from probunet_tpu.ops.pallas.partition import clear_kernel_mesh

    clear_kernel_mesh()
