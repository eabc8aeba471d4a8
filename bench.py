"""Headline benchmark: flagship ELBO train-step throughput.

Measures the BASELINE.json metric — train samples/sec at 128x128 tiles with
the M=15-member afCRPS ELBO (bs=32, 3 variables, latent 32) — against the
reference anchor of ~123 samples/s on its CUDA GPU
(reference src/notebooks/test_prob_unet.ipynb cell 2: 3.84 it/s @ bs=32;
see BASELINE.md). Prints ONE JSON line.

Everything (synthetic data, stats, batches, train state) lives on device:
the measurement isolates the compiled train step, and no large host<->device
transfer is involved (remote-attached TPU links are slow; production input
pipelines overlap transfers via double-buffered prefetch, see
probunet_tpu.data.loader).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_SAMPLES_PER_SEC = 123.0  # 3.84 it/s * bs 32 (BASELINE.md)


def main() -> None:
    from probunet_tpu.config import preset
    from probunet_tpu.data.climex import compute_stats
    from probunet_tpu.data.synthetic import synthetic_climex_fields_device
    from probunet_tpu.data.transforms import apply_physical_transform
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.train.loop import make_train_step
    from probunet_tpu.train.state import create_train_state

    cfg = preset("probunet_multivar_128")
    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:  # keep CI smoke runs tractable; real numbers come from TPU
        cfg.data.resolution = (64, 64)
        cfg.data.lowres_scale = 8
        cfg.train.batch_size = 8
        cfg.train.ensemble_size = 4

    b = cfg.train.batch_size
    res = cfg.data.resolution
    nb = 8  # distinct batches cycled through

    # synthetic ClimEx-like data, generated and kept on device
    hr = synthetic_climex_fields_device(
        nb * b, res[0], res[1], cfg.data.variables, seed=0
    )
    hr = jax.jit(lambda a: apply_physical_transform(a, cfg.data.variables))(hr)
    stats = jax.jit(lambda a: compute_stats(a, cfg.data.lowres_scale))(hr)
    batches = [hr[i * b:(i + 1) * b] for i in range(nb)]

    model = ProbabilisticUNet(
        input_channels=cfg.model.input_channels,
        num_classes=cfg.model.num_classes,
        latent_dim=cfg.model.latent_dim,
        num_filters=cfg.model.num_filters,
        model_channels=cfg.model.model_channels,
        channel_mult=cfg.model.channel_mult,
        img_resolution=res,
        num_blocks=cfg.model.num_blocks,
        dropout=cfg.model.dropout,
    )
    x = jnp.zeros((b, res[0], res[1], cfg.model.input_channels), jnp.float32)
    y = jnp.zeros((b, res[0], res[1], cfg.model.num_classes), jnp.float32)
    state = create_train_state(model, x, y, seed=cfg.train.seed, lr=cfg.train.lr)
    step = make_train_step(model, cfg)

    b0 = jnp.float32(1.0)
    b1 = jnp.float32(1e-3)

    # warmup / compile
    for i in range(2):
        state, metrics = step(state, batches[i % nb], stats, b0, b1)
    jax.block_until_ready(metrics)

    n_steps = 10 if on_cpu else 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, batches[i % nb], stats, b0, b1)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    samples_per_sec = n_steps * b / dt
    print(json.dumps({
        "metric": "train_samples_per_sec_128x128_afcrps_M15" if not on_cpu
        else "train_samples_per_sec_cpu_smoke",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
