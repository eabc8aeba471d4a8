"""GSPMD partitioning context for the Pallas loss kernels.

A ``pallas_call`` inside a GSPMD-jitted step is an opaque custom call:
XLA cannot partition it, so on a multi-chip mesh it would all-gather /
replicate the full operands on every chip (the round-2 advisor finding
against ops.losses). The cure is the standard Pallas-under-GSPMD pattern:
wrap the kernel in ``jax.shard_map`` over the mesh so each chip runs the
kernel on its local batch shard. The CRPS terms are independent per batch
element, and exact under spatial (pixel-axis) sharding too because every
term is pointwise in the pixel before the final sum — partial sums just
need a ``psum`` over the spatial axis. Gradients of replicated operands
(the fcomb weights) get their cross-shard ``psum`` from shard_map's
transpose rule automatically (verified against the unsharded oracle in
tests/test_parallel.py).

The loss functions are traced deep inside model code with no mesh in
scope — a plain GSPMD jit exposes no ambient mesh to the trace
(``jax.sharding.get_abstract_mesh()`` is empty inside ``jit`` with
``NamedSharding`` in_shardings; measured on jax 0.9). So the mesh is
threaded through this module-level context, set by the parallel step
builders (parallel/data_parallel.py, ``__graft_entry__.dryrun_multichip``).
Like the env knobs in ops.losses, the context is read at TRACE time: steps
jitted while a mesh is active keep the sharded kernel wrap in their cache.

The reference has no counterpart (single-GPU torch, SURVEY.md §2.5); this
is the TPU-native scaling path for its loss kernels.
"""

from __future__ import annotations

import jax

_MESH = None
_BATCH_AXIS = "data"
_SPATIAL_AXIS = "spatial"


def set_kernel_mesh(mesh, batch_axis: str = "data",
                    spatial_axis: str = "spatial") -> None:
    """Declare the mesh the jitted train/eval steps shard their batch over.

    ``batch_axis`` is the mesh axis the batch dim is sharded over;
    ``spatial_axis`` (if present in the mesh with size > 1) additionally
    shards the flattened pixel axis. Last call wins — one process, one
    mesh is the supported regime (parallel/data_parallel.py sets this).
    """
    global _MESH, _BATCH_AXIS, _SPATIAL_AXIS
    _MESH = mesh
    _BATCH_AXIS = batch_axis
    _SPATIAL_AXIS = spatial_axis


def clear_kernel_mesh() -> None:
    global _MESH
    _MESH = None


def kernel_mesh_is_active() -> bool:
    """True when a >1-device kernel mesh is set (trace-time query)."""
    return _MESH is not None and _MESH.size > 1


def active_kernel_mesh(batch: int, pixels: int | None):
    """(mesh, batch_axis, spatial_axis | None) when the sharded kernel wrap
    applies to an operand with leading ``batch`` dim (and optionally a
    ``pixels`` trailing dim), else (None, None, None).

    The wrap needs exact divisibility (shard_map requirement); a
    non-divisible batch degrades to the caller's unwrapped fallback, which
    is always *correct* (GSPMD replicates the custom call) just not
    partitioned.
    """
    mesh = _MESH
    if mesh is None or mesh.size == 1:
        return None, None, None
    if _BATCH_AXIS not in mesh.shape:
        return None, None, None
    if batch % mesh.shape[_BATCH_AXIS]:
        return None, None, None
    s_ax = None
    if _SPATIAL_AXIS in mesh.shape and mesh.shape[_SPATIAL_AXIS] > 1:
        if pixels is not None and pixels % mesh.shape[_SPATIAL_AXIS] == 0:
            s_ax = _SPATIAL_AXIS
    # mesh axes not named here must not shard the operands: shard_map's
    # in_specs below replicate over them, which GSPMD enforces with a
    # gather — correct for any mesh, partitioned for the supported ones.
    return mesh, _BATCH_AXIS, s_ax


def psum_if(x, axis_name):
    """psum over ``axis_name`` when set (spatial partial sums), else x."""
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)
