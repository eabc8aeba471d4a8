"""Ensemble-member parallelism for the serve path.

The reference generates its test-set ensembles one member at a time,
re-running the full U-Net per draw (reference results.ipynb cell 12 /
src/prob_unet.py:194-224 with ``training=False``; SURVEY.md §3.3). This
framework already shares the U-Net features across members and vmaps the
Fcomb decode; HERE the member axis additionally becomes a mesh dimension:

- U-Net features are computed batch-sharded over "data" (they carry no
  member axis, so GSPMD keeps them replicated along "member" — zero
  collectives in the decode);
- the M prior draws ``zs (M, B, D)`` are sharded M-over-"member",
  B-over-"data";
- each chip decodes only its member shard through Fcomb, and the HR-units
  ensemble comes back (B, M, H, W, C) sharded over both axes.

Members are conditionally independent given the features, so this is
embarrassingly parallel — a ("data", "member") mesh turns M-member
generation into ~M/n_member per-chip work with no cross-chip traffic
besides the (replicated) parameters. This is the natural second mesh axis
for serving large ensembles (e.g. the 30-year x M=20 return-level sweeps
of test_return_levels.ipynb cell 2).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from probunet_tpu.config import Config
from probunet_tpu.data.climex import (
    lrinterp_from_batch,
    preprocess_batch,
    residual_to_hr,
)
from probunet_tpu.models.prob_unet import ProbabilisticUNet
from probunet_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS

MEMBER_AXIS = "member"


def make_member_mesh(
    n_data: int | None = None,
    n_member: int = 1,
    devices=None,
    n_spatial: int = 1,
) -> Mesh:
    """A ("data", "member") mesh; ``n_spatial > 1`` inserts a "spatial" axis
    (("data", "spatial", "member")) so the serve path can combine batch,
    image-height and ensemble-member sharding in ONE program — GSPMD
    inserts the conv halo exchanges on the spatial axis exactly as in the
    train step (parallel/data_parallel.py). ``n_data=None`` uses all
    remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        if n % (n_member * n_spatial):
            raise ValueError(
                f"{n} devices not divisible by n_member*n_spatial="
                f"{n_member * n_spatial}")
        n_data = n // (n_member * n_spatial)
    shape = ((n_data, n_member) if n_spatial == 1
             else (n_data, n_spatial, n_member))
    axes = ((DATA_AXIS, MEMBER_AXIS) if n_spatial == 1
            else (DATA_AXIS, SPATIAL_AXIS, MEMBER_AXIS))
    want = int(np.prod(shape))
    if want > n:
        raise ValueError(f"mesh {shape} needs {want} devices, have {n}")
    devices = devices[:want]
    try:
        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except (ValueError, AssertionError):
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def make_parallel_sample_step(
    model: ProbabilisticUNet,
    cfg: Config,
    mesh: Mesh,
    num_samples: int = 16,
    quant=None,
) -> Callable:
    """jit member+data-sharded prior-ensemble generation over ``mesh``.

    step(params, hr_batch, key, stats) -> HR-units ensemble
    (B, num_samples, H, W, C), B sharded over "data", members over
    "member". Matches the single-device ``ProbabilisticUNet.sample`` +
    ``residual_to_hr`` path bit-for-bit up to float tolerance (tested on
    the CPU device farm).

    ``quant``: an optional "quant" collection of calibrated int8 scales
    (ops/quantize.py) — scalar constants closed over the jit, so GSPMD
    replicates them like any other literal.
    """
    spatial = mesh.shape.get(SPATIAL_AXIS, 1) > 1
    repl = NamedSharding(mesh, P())
    if spatial:
        # H of the (B, H, W, C) inputs rides the "spatial" axis; the HR
        # ensemble keeps its height sharded too (axis 2 of (B, M, H, W, C))
        batch_sh = NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))
        ens_sh = NamedSharding(
            mesh, P(DATA_AXIS, MEMBER_AXIS, SPATIAL_AXIS, None, None))
    else:
        batch_sh = NamedSharding(mesh, P(DATA_AXIS))
        ens_sh = NamedSharding(
            mesh, P(DATA_AXIS, MEMBER_AXIS, None, None, None))
    zs_sh = NamedSharding(mesh, P(MEMBER_AXIS, DATA_AXIS, None))
    d = cfg.data

    def variables(params):
        return {"params": params} if quant is None else \
            {"params": params, "quant": quant}

    @partial(
        jax.jit,
        in_shardings=(repl, batch_sh, repl, repl),
        out_shardings=ens_sh,
    )
    def step(params, hr_batch, key, stats):
        batch = preprocess_batch(
            hr_batch, stats, d.pipeline, d.lowres_scale, d.interp_mode,
            d.epsilon, d.standardization,
        )
        x = batch["inputs"]
        feats, prior, _ = model.apply(
            variables(params), x, method=ProbabilisticUNet.encode
        )
        zs = prior.rsample(key, sample_shape=(num_samples,))  # (M, B, D)
        zs = jax.lax.with_sharding_constraint(zs, zs_sh)
        out = model.apply(  # (B, M, H, W, C)
            variables(params), feats, zs, method=ProbabilisticUNet.decode
        )
        lrinterp = lrinterp_from_batch(batch, d.lowres_scale, d.interp_mode)
        ist = batch.get("stand_stats")
        if ist is not None:  # add the member axis for (B, M, ...) outputs
            ist = jax.tree.map(lambda a: a[:, None], ist)
        hr = residual_to_hr(
            out, lrinterp[:, None], stats, d.pipeline, d.epsilon,
            d.standardization, item_stats=ist,
        )
        return jax.lax.with_sharding_constraint(hr, ens_sh)

    return step
