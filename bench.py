"""Headline benchmark: flagship ELBO train-step throughput.

Measures the BASELINE.json metric — train samples/sec at 128x128 tiles with
the M=15-member afCRPS ELBO (bs=32, 3 variables, latent 32) — against the
reference anchor of ~123 samples/s on its CUDA GPU
(reference src/notebooks/test_prob_unet.ipynb cell 2: 3.84 it/s @ bs=32;
see BASELINE.md). Prints ONE JSON line.

Modes (BENCH_MODE env var), each with its BASELINE.md anchor:
  (default)  train step, afCRPS ELBO M=15            — ref ~123 samples/s
  eval       no-grad ELBO, M=5 posterior draws       — ref ~530 samples/s
  msssim     train step, WMSE-MS-SSIM ELBO, M=1      — ref ~192 samples/s
  ensemble   16-member prior-ensemble generation     — ref ~2,450 fields/s

The default mode also reports FLOPs/step from the compiled executable's
cost analysis and an MFU estimate against the v5e bf16 peak (197 TFLOP/s).

Everything (synthetic data, stats, batches, train state) lives on device:
the measurement isolates the compiled train step, and no large host<->device
transfer is involved (remote-attached TPU links are slow; production input
pipelines overlap transfers via double-buffered prefetch, see
probunet_tpu.data.loader).

TIMING IS SYNCHRONIZED BY A HOST READ, NOT block_until_ready: on the
remote-attached (axon-tunnel) backend ``jax.block_until_ready`` returns when
the local proxy buffer is enqueued, NOT when the remote compute finishes —
a chained 8192^3 matmul loop "measures" 60 PFLOP/s with block_until_ready
and 151 TF/s (a sane 77% of v5e bf16 peak) when the loop result is actually
read back. Every timed region here therefore ends with a scalar host read
whose value depends on the whole step chain.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

# reference anchors (BASELINE.md "Throughput"; all at bs=32 on 1 CUDA GPU)
BASELINE_TRAIN = 123.0      # 3.84 it/s * 32  (afCRPS ELBO, M=15)
BASELINE_EVAL = 530.0       # 16.6 it/s * 32  (no-grad ELBO, M=5)
BASELINE_MSSSIM = 192.0     # 6.0 it/s * 32   (WMSE-MS-SSIM, M=1)
BASELINE_ENSEMBLE = 2450.0  # 3.83 it/s * 32 * 20 member-fields/s

V5E_BF16_PEAK_FLOPS = 197e12  # per chip (public TPU v5e spec)


def _sync(x) -> float:
    """True device synchronization: a scalar host read (see module
    docstring — block_until_ready is a no-op on the remote axon backend)."""
    return float(jax.device_get(jnp.ravel(x)[0]))


def _cost_per_step(compiled) -> tuple[float | None, float | None]:
    """(FLOPs, HBM bytes accessed) of one compiled step, from XLA's cost
    analysis. Bytes are post-fusion — only buffers that cross HBM count —
    which anchors the roofline claim in DESIGN.md ("HBM roofline")."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
        ba = ca.get("bytes accessed")
        return flops, (float(ba) if ba is not None else None)
    except Exception:
        return None, None


def _flops_per_step(compiled) -> float | None:
    """Total FLOPs of one compiled step, from XLA's cost analysis."""
    return _cost_per_step(compiled)[0]


def main() -> None:
    if os.environ.get("PROBUNET_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PROBUNET_PLATFORM"])
    from probunet_tpu.config import preset
    from probunet_tpu.data.climex import compute_stats
    from probunet_tpu.data.synthetic import synthetic_climex_fields_device
    from probunet_tpu.data.transforms import apply_physical_transform
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.train.loop import make_eval_step, make_train_step
    from probunet_tpu.train.state import create_train_state
    from probunet_tpu.utils.compile_opts import tuned_compiler_options

    # PROBUNET_XLA_OPTS rides PJRT compiler_options into the server-side TPU
    # compiler (XLA_FLAGS cannot: the client's flag parser aborts on TPU
    # flags — see utils/compile_opts.py). Applied to every outer jit here;
    # inner jits are inlined at trace time, so the outer one must carry it.
    copts = tuned_compiler_options()
    jit = functools.partial(jax.jit, compiler_options=copts)

    mode = os.environ.get("BENCH_MODE", "train")
    cfg = preset("probunet_multivar_128")
    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:  # keep CI smoke runs tractable; real numbers come from TPU
        cfg.data.resolution = (64, 64)
        cfg.data.lowres_scale = 8
        cfg.train.batch_size = 8
        cfg.train.ensemble_size = 4
    # A/B knobs: BENCH_DTYPE=float32 for the f32 step;
    # PROBUNET_CRPS_IMPL=xla swaps the Pallas CRPS kernels (the fused
    # fcomb-CRPS ELBO AND the plain afCRPS terms kernel — see
    # fcomb_crps.fused_elbo_enabled) for the XLA formulation.
    cfg.model.compute_dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    # bs=32 is the reference's setting (it measured 123 samples/s there);
    # the shipped default fills the chip: bs=128 -> 651 samples/s vs 257 at
    # bs=32 (honest host-read timing). BENCH_BS=32 reproduces the strictly
    # matched-config comparison. bs=256 exceeds 16G HBM at M=15 un-rematted
    # and loses rematted (522); use train.accum for larger effective
    # batches.
    if not on_cpu:
        cfg.train.batch_size = int(os.environ.get("BENCH_BS", "128"))
    # BENCH_REMAT=1 checkpoints every UNet block (O(depth) less activation
    # memory for ~1 extra fwd of FLOPs) — the lever that admits bs>=256.
    # BENCH_REMAT=0,1 (a comma list of level indices) checkpoints only the
    # blocks at those resolution levels (train.remat_levels): the shallow
    # levels hold the largest activations, so selective remat buys most of
    # the memory at a fraction of the recompute. ("0" alone means OFF —
    # reference level 0 by itself as "0,".)
    # BENCH_DROPOUT overrides model dropout (BENCH_DROPOUT=0 bounds the
    # total cost of dropout: RNG bit generation — u32 tensors 2× the bf16
    # activation bytes, see scripts/hlo_traffic.py — plus mask traffic).
    if "BENCH_DROPOUT" in os.environ:
        cfg.model.dropout = float(os.environ["BENCH_DROPOUT"])
    # BENCH_REMAT=save_convs applies the policy-remat mode: conv outputs
    # stay saved, the elementwise GN/FiLM/SiLU/dropout chains (and their
    # dropout masks) are recomputed in the backward pass — bytes for VPU
    # flops on the HBM-bound step (models/unet.py `remat`).
    remat_env = os.environ.get("BENCH_REMAT", "0")
    if remat_env in ("save_convs", "save_convs_all"):
        cfg.train.remat = remat_env
    elif "," in remat_env or remat_env not in ("0", "1"):
        cfg.train.remat_levels = tuple(
            int(v) for v in remat_env.split(",") if v.strip()
        )
    else:
        cfg.train.remat = remat_env == "1"
    # ensemble mode runs at the full default batch: bs=128 x 16 members fits
    # since the bf16 residual stream (32.4k member-fields/s vs 19.4k at
    # bs=64; r2's 64-cap predates it). BENCH_BS still overrides.
    if mode == "msssim":
        # BASELINE.md row 3: WMSE-MS-SSIM ELBO collapses the ensemble to its
        # mean (reference src/prob_unet_utils.py:285-286) and the reference
        # ran it with M=1
        cfg.loss.loss_type = "mse+ssim"
        cfg.loss.lam_w = 0.158
        cfg.train.ensemble_size = 1

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
        remat=tuple(cfg.train.remat_levels) or cfg.train.remat,
    )
    x = jnp.zeros((b, res[0], res[1], cfg.model.input_channels), jnp.float32)
    y = jnp.zeros((b, res[0], res[1], cfg.model.num_classes), jnp.float32)
    state = create_train_state(model, x, y, seed=cfg.train.seed, lr=cfg.train.lr)

    b0 = jnp.float32(1.0)
    b1 = jnp.float32(1e-3)

    if mode == "ensemble":
        # 16-member prior-ensemble generation throughput (the second
        # BASELINE.json metric). Reference anchor: M=20 draws re-running the
        # full U-Net per draw, 3.83 it/s @ bs=32 on 64x64 ≈ 2,450
        # member-fields/s (BASELINE.md). Here: features once + vmapped
        # fcomb decode over members (SURVEY.md §3.3 design note).
        m_members = 16
        from probunet_tpu.data.climex import (
            lrinterp_from_batch, preprocess_batch, residual_to_hr,
        )

        @jit
        def gen(variables, hr_batch, key):
            batch = preprocess_batch(hr_batch, stats, cfg.data.pipeline,
                                     cfg.data.lowres_scale,
                                     cfg.data.interp_mode, cfg.data.epsilon)
            out = model.apply(variables, batch["inputs"],
                              num_samples=m_members,
                              method=ProbabilisticUNet.sample,
                              rngs={"latent": key})
            lrinterp = lrinterp_from_batch(batch, cfg.data.lowres_scale,
                                           cfg.data.interp_mode)
            return residual_to_hr(out, lrinterp[:, None], stats,
                                  cfg.data.pipeline, cfg.data.epsilon)

        # BENCH_QUANT=int8: serve the prior-ensemble path with int8 convs
        # (ops/quantize.py). Calibration sows per-conv input absmax over 4
        # of the 8 bench batches; the scales then ride the "quant" variable
        # collection into every EDMConv/_Conv3x3.
        variables = {"params": state.params}
        if os.environ.get("BENCH_QUANT") == "int8":
            from probunet_tpu.ops.quantize import (
                merge_stats, quant_scales_from_stats,
            )

            @jit
            def calib(params, hr_batch, key):
                batch = preprocess_batch(hr_batch, stats, cfg.data.pipeline,
                                         cfg.data.lowres_scale,
                                         cfg.data.interp_mode,
                                         cfg.data.epsilon)
                _, vs = model.apply({"params": params}, batch["inputs"],
                                    num_samples=m_members,
                                    method=ProbabilisticUNet.sample,
                                    rngs={"latent": key},
                                    mutable=["quant_stats"])
                return vs["quant_stats"]

            key0 = jax.random.key(99)
            qstats = calib(state.params, batches[0], key0)
            for i in range(1, 4):
                qstats = merge_stats(qstats, calib(
                    state.params, batches[i], jax.random.fold_in(key0, i)))
            scales = quant_scales_from_stats(qstats)
            # BENCH_QUANT_SKIP=heads (comma-separated regexes): mixed-
            # precision serve — matching convs stay float (quant_skip)
            if os.environ.get("BENCH_QUANT_SKIP"):
                from probunet_tpu.ops.quantize import quant_skip
                scales = quant_skip(
                    scales, os.environ["BENCH_QUANT_SKIP"].split(","))
            variables = {"params": state.params, "quant": scales}

        # one jitted lax.scan chains all generations: the measured window
        # contains ZERO per-step host dispatches (each axon RPC costs ~ms of
        # host time, which at 40 ms/step materially understates the device)
        stacked = jnp.stack(batches)                   # (nb, b, H, W, C)
        key = jax.random.key(0)

        @jit
        def gen_epoch(variables, hrs, key):
            def body(carry, inp):
                hr_b, i = inp
                out = gen(variables, hr_b, jax.random.fold_in(key, i))
                # FULL reduction: a single-element checksum would let XLA
                # slice-push/DCE the other members' decode out of the
                # measured window (code-review r3 finding); the sum makes
                # every member-field a live dependency at negligible cost
                return (carry + jnp.sum(out.astype(jnp.float32))
                        ).astype(jnp.float32), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                (hrs, jnp.arange(hrs.shape[0])))
            return acc

        n_reps = 1 if on_cpu else 8
        acc = gen_epoch(variables, stacked, key)
        _sync(acc)
        t0 = time.perf_counter()
        for i in range(n_reps):
            acc = gen_epoch(variables, stacked, jax.random.fold_in(key, i))
        _sync(acc)
        dt = time.perf_counter() - t0
        member_fields_per_sec = n_reps * nb * b * m_members / dt
        suffix = "_int8" if "quant" in variables else ""
        if suffix and os.environ.get("BENCH_QUANT_SKIP"):
            suffix += "_skip_" + os.environ["BENCH_QUANT_SKIP"].replace(
                ",", "_")
        result = {
            "metric": f"ensemble16_member_fields_per_sec_128x128{suffix}",
            "value": round(member_fields_per_sec, 2),
            "unit": "member-fields/s",
            "vs_baseline": round(member_fields_per_sec / BASELINE_ENSEMBLE, 3),
        }
        # FLOPs from the single-batch gen step (lowering the scan-chained
        # epoch would count the loop body ONCE — XLA's cost analysis does
        # not multiply while-loop bodies by trip count)
        flops = _flops_per_step(
            gen.lower(variables, batches[0], key).compile())
        if flops is not None:
            result["flops_per_batch"] = flops
            result["mfu_vs_v5e_bf16_peak"] = round(
                flops * nb / (dt / n_reps) / V5E_BF16_PEAK_FLOPS, 4)
        print(json.dumps(result))
        return

    if mode == "eval":
        # no-grad posterior ELBO at M = eval_ensemble_size (5), the
        # reference's per-epoch eval pass (BASELINE.md row "Eval rate").
        # BENCH_QUANT=int8 serves it with calibrated int8 convs
        # (ops/quantize.py calibrate_elbo — VERDICT r4 #2: this was the one
        # serve mode still bf16-only after the ensemble path's +43%).
        quant = None
        if os.environ.get("BENCH_QUANT") == "int8":
            from probunet_tpu.ops.quantize import calibrate_elbo
            quant = calibrate_elbo(model, state.params, batches[:4], cfg,
                                   stats, key=jax.random.key(99))
        eval_step = make_eval_step(model, cfg, quant=quant)
        key = jax.random.key(0)
        stacked = jnp.stack(batches)

        # scan-chained epochs: no per-step host dispatch in the window
        @jit
        def eval_epoch(params, hrs, key):
            def body(carry, inp):
                hr_b, i = inp
                m = eval_step(params, jax.random.fold_in(key, i), hr_b, stats)
                return carry + m["loss"], None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                (hrs, jnp.arange(hrs.shape[0])))
            return acc

        n_reps = 2 if on_cpu else 8
        acc = eval_epoch(state.params, stacked, key)
        _sync(acc)
        t0 = time.perf_counter()
        for i in range(n_reps):
            acc = eval_epoch(state.params, stacked, jax.random.fold_in(key, i))
        _sync(acc)
        dt = time.perf_counter() - t0
        samples_per_sec = n_reps * nb * b / dt
        qsuffix = "_int8" if quant is not None else ""
        result = {
            "metric": f"eval_samples_per_sec_128x128_elbo_M5_bs{b}{qsuffix}",
            "value": round(samples_per_sec, 2),
            "unit": "samples/s",
            "vs_baseline": round(samples_per_sec / BASELINE_EVAL, 3),
        }
        # FLOPs from the single-batch eval step (the scan-chained epoch's
        # cost analysis counts the loop body once, not x trip count)
        flops = _flops_per_step(
            eval_step.lower(state.params, key, batches[0], stats).compile())
        if flops is not None:
            result["flops_per_batch"] = flops
            result["mfu_vs_v5e_bf16_peak"] = round(
                flops * nb / (dt / n_reps) / V5E_BF16_PEAK_FLOPS, 4)
        print(json.dumps(result))
        return

    # train-step modes (default afCRPS M=15, or msssim M=1)
    step = make_train_step(model, cfg)

    # warmup / compile
    for i in range(2):
        state, metrics = step(state, batches[i % nb], stats, b0, b1)
    _sync(metrics["grad_norm"])

    n_steps = 10 if on_cpu else 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, batches[i % nb], stats, b0, b1)
    # grad_norm of the final step depends on the entire step chain
    _sync(metrics["grad_norm"])
    dt = time.perf_counter() - t0

    samples_per_sec = n_steps * b / dt
    sec_per_step = dt / n_steps
    flops, hbm_bytes = _cost_per_step(
        step.lower(state, batches[0], stats, b0, b1).compile()
    )
    if mode == "msssim":
        result = {
            "metric": f"train_samples_per_sec_128x128_msssim_M1_bs{b}",
            "value": round(samples_per_sec, 2),
            "unit": "samples/s",
            "vs_baseline": round(samples_per_sec / BASELINE_MSSSIM, 3),
        }
    else:
        result = {
            "metric": f"train_samples_per_sec_128x128_afcrps_M15_bs{b}"
            if not on_cpu else "train_samples_per_sec_cpu_smoke",
            "value": round(samples_per_sec, 2),
            "unit": "samples/s",
            "vs_baseline": round(samples_per_sec / BASELINE_TRAIN, 3),
        }
    if flops is not None:
        result["flops_per_step"] = flops
        # MFU vs the bf16 systolic-array peak; an upper-bound utilization
        # figure when compute runs in f32 (the MXU f32 path is slower)
        result["mfu_vs_v5e_bf16_peak"] = round(
            flops / sec_per_step / V5E_BF16_PEAK_FLOPS, 4
        )
    if hbm_bytes is not None:
        result["hbm_bytes_per_step"] = hbm_bytes
        # fraction of the v5e 819 GB/s HBM roofline the step sustains —
        # the binding resource for this model shape (DESIGN.md)
        result["hbm_bw_util_vs_819GBps"] = round(
            hbm_bytes / sec_per_step / 819e9, 4
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
