"""Weak-scaling benchmark of the data-parallel train step over all devices.

Runs the flagship afCRPS M=15 train step at a PER-CHIP batch of
``BENCH_BS`` (default 128) on meshes of 1, 2, 4, ... up to every attached
device, and prints one JSON line per mesh size. Ideal weak scaling keeps
samples/s/chip flat; the gap from flat is the gradient all-reduce cost
(the only collective in the step — params replicated, batch sharded; see
DESIGN.md "Parallelism").

On a single-chip dev box this degenerates to the bench.py train mode; run
it on a v5e pod slice for real scaling numbers. Works on the CPU test farm
(PROBUNET_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
for functional validation — CPU timings are not meaningful.

Timing uses a scalar host read (bench.py `_sync` trap: block_until_ready
does not synchronize on remote-attached backends).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(x) -> float:
    return float(jax.device_get(jnp.ravel(x)[0]))


def main() -> None:
    if os.environ.get("PROBUNET_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PROBUNET_PLATFORM"])
    from probunet_tpu.config import preset
    from probunet_tpu.data.climex import compute_stats
    from probunet_tpu.data.synthetic import synthetic_climex_fields_device
    from probunet_tpu.data.transforms import apply_physical_transform
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.parallel import (
        make_mesh,
        make_parallel_train_step,
        replicate_global,
    )
    from probunet_tpu.train.state import create_train_state

    cfg = preset("probunet_multivar_128")
    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:
        cfg.data.resolution = (64, 64)
        cfg.data.lowres_scale = 8
        cfg.train.ensemble_size = 4
    per_chip_bs = int(os.environ.get(
        "BENCH_BS", "8" if on_cpu else "128"))
    cfg.model.compute_dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    n_dev = len(jax.devices())
    sizes_env = os.environ.get("BENCH_MESH_SIZES")
    if sizes_env:
        sizes = [int(v) for v in sizes_env.split(",") if v.strip()]
    else:
        sizes = [n for n in (1, 2, 4, 8, 16, 32, 64, 128, 256) if n <= n_dev]
    res = cfg.data.resolution

    model = ProbabilisticUNet(
        input_channels=len(cfg.data.variables),
        num_classes=len(cfg.data.variables),
        latent_dim=cfg.model.latent_dim,
        num_filters=cfg.model.num_filters,
        model_channels=cfg.model.model_channels,
        channel_mult=cfg.model.channel_mult,
        img_resolution=res,
        num_blocks=cfg.model.num_blocks,
        dropout=cfg.model.dropout,
        dtype=jnp.bfloat16
        if cfg.model.compute_dtype == "bfloat16" else jnp.float32,
    )

    from jax.sharding import NamedSharding, PartitionSpec as P

    for n in sizes:
        b = per_chip_bs * n
        hr = synthetic_climex_fields_device(
            b, res[0], res[1], cfg.data.variables, seed=0
        )
        hr = apply_physical_transform(hr, cfg.data.variables)
        stats = compute_stats(hr, cfg.data.lowres_scale)
        # params are batch-size independent: init at B=1 (a global-batch
        # init forward would OOM one chip at exactly the multi-chip sizes
        # this script exists to measure)
        x = jnp.zeros((1, res[0], res[1], len(cfg.data.variables)),
                      jnp.float32)
        state = create_train_state(model, x, x, seed=0, lr=cfg.train.lr)
        mesh = make_mesh(n_data=n, n_spatial=1,
                         devices=jax.devices()[:n])
        state = replicate_global(state, mesh)
        stats_g = replicate_global(stats, mesh)
        sh = NamedSharding(mesh, P("data"))
        if sh.is_fully_addressable:
            batch = jax.device_put(hr, sh)
        else:  # multi-host pod: contribute this process's slab only
            import numpy as np

            n_p, i_p = jax.process_count(), jax.process_index()
            per = b // n_p
            batch = jax.make_array_from_process_local_data(
                sh, np.asarray(hr[i_p * per:(i_p + 1) * per])
            )
        step = make_parallel_train_step(model, cfg, mesh, donate=False,
                                        spatial=False)
        b0 = replicate_global(jnp.float32(1.0), mesh)
        b1 = replicate_global(jnp.float32(0.1), mesh)
        # warmup + compile
        for _ in range(2):
            state2, metrics = step(state, batch, stats_g, b0, b1)
        _sync(metrics["grad_norm"])
        n_steps = 5 if on_cpu else 20
        t0 = time.perf_counter()
        s = state
        for _ in range(n_steps):
            s, metrics = step(s, batch, stats_g, b0, b1)
        _sync(metrics["grad_norm"])
        dt = time.perf_counter() - t0
        sps = n_steps * b / dt
        print(json.dumps({
            "metric": "dp_weak_scaling_train_samples_per_sec",
            "n_chips": n,
            "per_chip_batch": per_chip_bs,
            "value": round(sps, 2),
            "per_chip": round(sps / n, 2),
            "unit": "samples/s",
        }), flush=True)


if __name__ == "__main__":
    main()
