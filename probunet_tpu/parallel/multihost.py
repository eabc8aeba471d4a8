"""Multi-host (DCN) runtime helpers.

The reference is single-process/single-GPU (SURVEY.md §2.5 P5); the only
"cluster" machinery it has is a local dask client for NetCDF ingest
(reference src/climex_utils.py:75). This module is the TPU-pod story:

- :func:`initialize` — ``jax.distributed.initialize`` wrapper (idempotent,
  no-op single-process);
- :func:`global_batch` — assemble a globally-sharded batch from each host's
  local shard via ``jax.make_array_from_process_local_data`` so the DP input
  pipeline reads only per-host files and never gathers over DCN;
- :func:`process_local_indices` — which dataset rows this host should load
  for a given global batch (contiguous per-host slabs).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(**kwargs) -> None:
    """Start the multi-host runtime (no-op if single-process or already up).

    With no arguments this auto-detects the cluster environment and silently
    stays single-process when none is configured. When a coordinator is
    EXPLICITLY configured (any kwarg given), failures propagate — a
    misconfigured pod must not degrade silently to single-process training.
    """
    global _initialized
    # NOTE: do NOT probe jax.process_count()/jax.devices() here — any such
    # call initializes the XLA backend, after which
    # jax.distributed.initialize() refuses to run (found by the two-process
    # test: the wrapper itself was breaking the runtime it wraps). Inspect
    # the distributed client state instead.
    if _initialized or jax.distributed.is_initialized():
        _initialized = True
        return
    if kwargs:
        jax.distributed.initialize(**kwargs)  # explicit config: let it raise
        _initialized = True
        return
    try:
        jax.distributed.initialize()
        _initialized = True
    except (RuntimeError, ValueError):
        # single-process run (no coordinator configured): fine, stay local
        _initialized = True


def replicate_global(tree, mesh: Mesh):
    """Promote a pytree of identical-on-every-process values (params,
    optimizer state, stats, typed PRNG keys) to globally-replicated
    ``jax.Array``s over ``mesh``.

    ``jax.device_put`` refuses shardings with non-addressable devices, so
    the global array is assembled from per-local-device copies — zero
    cross-host data movement. The values MUST already be identical on every
    process (same seeds / deterministic init), which is the standard SPMD
    setup discipline.
    """
    import jax.numpy as jnp

    repl = NamedSharding(mesh, P())

    def leaf_to_global(leaf):
        leaf = jnp.asarray(leaf)
        locs = [jax.device_put(leaf, d) for d in mesh.local_devices]
        return jax.make_array_from_single_device_arrays(
            leaf.shape, repl, locs
        )

    return jax.tree.map(leaf_to_global, tree)


def process_local_indices(global_indices: np.ndarray) -> np.ndarray:
    """The contiguous slab of a global batch this host is responsible for."""
    n = jax.process_count()
    i = jax.process_index()
    per = len(global_indices) // n
    return global_indices[i * per:(i + 1) * per]


def global_batch(local_batch: np.ndarray, mesh: Mesh,
                 spatial: bool = False) -> jax.Array:
    """Assemble the global array from this host's local shard.

    local_batch: (B_local, H, W, C) rows this host loaded
    (``process_local_indices`` of the global batch). Returns a global
    (B_global, H, W, C) jax.Array sharded batch-over-"data" (and rows over
    "spatial" if requested) without any cross-host data movement.
    """
    spec = P("data", "spatial", None, None) if spatial else P("data")
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_batch)
