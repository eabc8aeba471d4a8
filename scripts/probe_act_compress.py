"""Activation-compression probe (VERDICT r4 #4) — pre-registered rule.

Measures the flagship afCRPS M=15 bf16 train step with and without
PROBUNET_ACT_COMPRESS=int8 (ops/act_compress.py: conv inputs saved int8,
exact fwd/dx, int8-roundtripped dW):

  1. bs=128: samples/s (honest host-read sync), cost-analysis HBM GB/step,
     and XLA memory_analysis peak/temp bytes, compressed vs float.
  2. bs=256: memory_analysis for BOTH (no allocation — bs>=192 wedges the
     remote allocator when it actually OOMs, so we only RUN a config whose
     analyzed peak fits the 16 GB v5e HBM), then run whichever fits.

DECISION RULE (pre-registered, per VERDICT r4 #4): act-compress ships as
a documented lever only if (a) some admitted batch size beats 651
samples/s (the r3/r4 headline) AND (b) a 30-epoch quality_run A/B lands
inside the QUALITY.md seed-noise band. Otherwise the training-throughput
file closes with every lever measured.

Usage: python scripts/probe_act_compress.py  (TPU)
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_LIMIT = 16e9


def _sync(x) -> float:
    return float(jax.device_get(jnp.ravel(x)[0]))


def build(bs: int):
    from probunet_tpu.config import preset
    from probunet_tpu.data.climex import compute_stats
    from probunet_tpu.data.synthetic import synthetic_climex_fields_device
    from probunet_tpu.data.transforms import apply_physical_transform
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.train.loop import make_train_step
    from probunet_tpu.train.state import create_train_state

    cfg = preset("probunet_multivar_128")
    cfg.train.batch_size = bs
    cfg.model.compute_dtype = "bfloat16"
    res = cfg.data.resolution
    model = ProbabilisticUNet(img_resolution=res, dtype=jnp.bfloat16,
                              dropout=cfg.model.dropout)
    hr = synthetic_climex_fields_device(bs, res[0], res[1],
                                        cfg.data.variables, seed=0)
    hr = jax.jit(lambda a: apply_physical_transform(a, cfg.data.variables))(hr)
    stats = jax.jit(lambda a: compute_stats(a, cfg.data.lowres_scale))(hr)
    x = jnp.zeros((bs, res[0], res[1], 3), jnp.float32)
    state = create_train_state(model, x, x, seed=cfg.train.seed)
    step = make_train_step(model, cfg)
    return step, state, hr, stats


def analyze(bs: int, compress: bool):
    os.environ["PROBUNET_ACT_COMPRESS"] = "int8" if compress else ""
    step, state, hr, stats = build(bs)
    b0, b1 = jnp.float32(1.0), jnp.float32(1e-3)
    compiled = step.lower(state, hr, stats, b0, b1).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    row = {"bs": bs, "compress": compress,
           "flops_tf": float(ca["flops"]) / 1e12,
           "hbm_gb": float(ca.get("bytes accessed", 0.0)) / 1e9}
    try:
        ma = compiled.memory_analysis()
        row["temp_gb"] = ma.temp_size_in_bytes / 1e9
        row["argument_gb"] = ma.argument_size_in_bytes / 1e9
        row["output_gb"] = ma.output_size_in_bytes / 1e9
        row["peak_gb"] = (ma.temp_size_in_bytes
                          + ma.argument_size_in_bytes) / 1e9
    except Exception as e:  # memory_analysis is backend-dependent
        row["memory_analysis_error"] = str(e)
    return row, (step, state, hr, stats, b0, b1, compiled)


def run_timed(ctx, n_steps=30):
    step, state, hr, stats, b0, b1, _ = ctx
    for _ in range(2):
        state, metrics = step(state, hr, stats, b0, b1)
    _sync(metrics["grad_norm"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, hr, stats, b0, b1)
    _sync(metrics["grad_norm"])
    dt = time.perf_counter() - t0
    return n_steps * hr.shape[0] / dt, dt / n_steps


def main():
    rows = []
    for bs, compress in ((128, False), (128, True),
                         (256, False), (256, True)):
        row, ctx = analyze(bs, compress)
        # only RUN configs whose analyzed peak fits (bs=128 is the known-
        # good baseline; bs>=192 must prove it fits before any allocation)
        peak = row.get("peak_gb")
        fits = (bs == 128) if peak is None else (peak < 0.93 * HBM_LIMIT / 1e9)
        if fits:
            try:
                rate, t = run_timed(ctx)
                row["samples_per_sec"] = round(rate, 2)
                row["ms_per_step"] = round(t * 1e3, 2)
            except Exception as e:
                row["run_error"] = str(e)[:200]
        else:
            row["skipped"] = "analyzed peak exceeds HBM; not run"
        print(json.dumps(row))
        rows.append(row)
        del ctx
    print(json.dumps({"probe": "act_compress", "rows": rows}))


if __name__ == "__main__":
    main()
