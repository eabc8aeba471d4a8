"""Mesh construction and sharding helpers.

Axis convention:
  ``data``    — batch (data-parallel) axis; gradients all-reduce over it.
  ``spatial`` — image-row axis; GSPMD partitions convolutions spatially
                (XLA inserts the conv halo exchanges) so tiles larger than
                one chip's HBM can be trained/inferred on.

On a real pod slice the mesh is laid out over ICI by
``mesh_utils.create_device_mesh`` (contiguous submeshes ride the torus);
on CPU test farms (``--xla_force_host_platform_device_count=N``) the same
code paths run unchanged.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    n_data: int | None = None,
    n_spatial: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Create a ("data", "spatial") mesh.

    ``n_data=None`` uses all remaining devices for the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        if n % n_spatial:
            raise ValueError(f"{n} devices not divisible by n_spatial={n_spatial}")
        n_data = n // n_spatial
    want = n_data * n_spatial
    if want > n:
        raise ValueError(f"mesh {n_data}x{n_spatial} needs {want} devices, have {n}")
    devices = devices[:want]
    try:
        dev_array = mesh_utils.create_device_mesh(
            (n_data, n_spatial), devices=devices
        )
    except (ValueError, AssertionError):
        dev_array = np.asarray(devices).reshape(n_data, n_spatial)
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """Sharding for an NHWC batch: B over "data", H over "spatial"."""
    if spatial:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, spatial: bool = False):
    """Place a host batch (array or pytree of NHWC arrays) onto the mesh."""
    sh_b = batch_sharding(mesh, spatial=spatial)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1:
            return jax.device_put(x, sh_b if x.ndim == 4 else
                                  NamedSharding(mesh, P(DATA_AXIS)))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, batch)
