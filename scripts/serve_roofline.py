"""HBM-roofline derivation for the SERVE paths (VERDICT r4 #1b / #2).

Round 3 closed the TRAIN step's roofline (scripts/hbm_roofline.py +
scripts/fusion_table.py: 122.4 GB/step -> 149 ms floor, measured 201 ms =
1.34x). The int8 PTQ ensemble result (+43% over bf16) then proved "roofline
closed" had silently leaked onto the serve paths without a derivation.
This script closes that hole: for each serve program it reads FLOPs and
post-fusion HBM bytes from XLA's cost analysis, derives both floors

    t_mxu = flops / 197 TF/s      (v5e bf16 systolic peak; int8 convs lower
                                   the byte floor, not this one — XLA counts
                                   the same MACs)
    t_hbm = bytes / 819 GB/s

and reports measured-vs-floor with the honest host-read sync (bench.py
docstring: block_until_ready does NOT sync on the axon backend). The
measured window is a scan-chained epoch (zero per-step host dispatches),
so per-batch time = dt / (n_reps * nb) exactly as bench.py measures it.

Programs (pick with argv, default all):
  ensemble        bs x M=16 prior-ensemble generation, bf16
  ensemble_int8   same, calibrated int8 convs (ops/quantize.py)
  eval            no-grad posterior ELBO, M=5, bf16
  eval_int8       same, int8 via calibrate_elbo

A second table itemizes the top HBM movers of each program by fusion
(same method as scripts/fusion_table.py) so the gap between the int8
program and ITS OWN floor is attributable — e.g. which tensors still
move at bf16/f32 width after the convs dropped to int8.

Usage: python scripts/serve_roofline.py [ensemble|ensemble_int8|eval|eval_int8 ...]
       BENCH_BS=128 overrides the batch.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from fusion_table import classify, shape_bytes  # noqa: E402

PEAK_FLOPS = 197e12
HBM_BW = 819e9


def _sync(x) -> float:
    return float(jax.device_get(jnp.ravel(x)[0]))


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"]), float(ca.get("bytes accessed", 0.0))


def _top_movers(compiled, k=12):
    """Top-k ENTRY instructions by HBM bytes (operands + output)."""
    import re

    txt = compiled.as_text()
    lines = txt.splitlines()
    entry_lines, in_entry, depth = [], False, 0
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
        if in_entry:
            entry_lines.append(ln)
            depth += ln.count("{") - ln.count("}")
            if depth <= 0 and len(entry_lines) > 1:
                break
    shapes = {}
    for ln in lines:
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (\([^)]*\)|\S+)", ln)
        if m:
            shapes[m.group(1)] = m.group(2)
    rows = []
    for ln in entry_lines[1:-1]:
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (\([^)]*\)|\S+)\s+(\w+)",
                     ln)
        if not m:
            continue
        name, shape, kind = m.groups()
        if kind in ("parameter", "constant", "get-tuple-element", "tuple",
                    "bitcast"):
            continue
        byt = shape_bytes(shape)
        for op in re.findall(r"%([\w.\-]+)", ln.split("=", 1)[1])[0:]:
            if op != name and op in shapes:
                byt += shape_bytes(shapes[op])
        meta = re.search(r'op_name="([^"]*)"', ln)
        rows.append((byt, kind, meta.group(1) if meta else ""))
    rows.sort(reverse=True)
    return rows[:k]


def build(mode: str, bs: int):
    from probunet_tpu.config import preset
    from probunet_tpu.data.climex import (
        compute_stats, lrinterp_from_batch, preprocess_batch, residual_to_hr,
    )
    from probunet_tpu.data.synthetic import synthetic_climex_fields_device
    from probunet_tpu.data.transforms import apply_physical_transform
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.train.loop import make_eval_step
    from probunet_tpu.train.state import create_train_state

    cfg = preset("probunet_multivar_128")
    cfg.train.batch_size = bs
    res = cfg.data.resolution
    nb = 8
    hr = synthetic_climex_fields_device(nb * bs, res[0], res[1],
                                        cfg.data.variables, seed=0)
    hr = jax.jit(lambda a: apply_physical_transform(a, cfg.data.variables))(hr)
    stats = jax.jit(lambda a: compute_stats(a, cfg.data.lowres_scale))(hr)
    batches = [hr[i * bs:(i + 1) * bs] for i in range(nb)]
    model = ProbabilisticUNet(img_resolution=res, dtype=jnp.bfloat16,
                              dropout=cfg.model.dropout)
    x = jnp.zeros((bs, res[0], res[1], 3), jnp.float32)
    state = create_train_state(model, x, x, seed=cfg.train.seed)
    params = state.params

    if mode.startswith("ensemble"):
        m_members = 16

        def gen_with(variables):
            @jax.jit
            def gen(hr_batch, key):
                batch = preprocess_batch(hr_batch, stats, cfg.data.pipeline,
                                         cfg.data.lowres_scale,
                                         cfg.data.interp_mode,
                                         cfg.data.epsilon)
                out = model.apply(variables, batch["inputs"],
                                  num_samples=m_members,
                                  method=ProbabilisticUNet.sample,
                                  rngs={"latent": key})
                lrinterp = lrinterp_from_batch(batch, cfg.data.lowres_scale,
                                               cfg.data.interp_mode)
                return residual_to_hr(out, lrinterp[:, None], stats,
                                      cfg.data.pipeline, cfg.data.epsilon)
            return gen

        variables = {"params": params}
        if mode == "ensemble_int8":
            from probunet_tpu.ops.quantize import (
                merge_stats, quant_scales_from_stats,
            )

            @jax.jit
            def calib(hr_batch, key):
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
            qs = calib(batches[0], key0)
            for i in range(1, 4):
                qs = merge_stats(qs, calib(batches[i],
                                           jax.random.fold_in(key0, i)))
            variables = {"params": params,
                         "quant": quant_scales_from_stats(qs)}
        gen = gen_with(variables)
        key = jax.random.key(0)
        stacked = jnp.stack(batches)

        @jax.jit
        def epoch(hrs, key):
            def body(carry, inp):
                hr_b, i = inp
                out = gen(hr_b, jax.random.fold_in(key, i))
                return (carry + jnp.sum(out.astype(jnp.float32))
                        ).astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  (hrs, jnp.arange(hrs.shape[0])))
            return acc

        compiled = gen.lower(batches[0], key).compile()
        unit = ("member-fields/s", bs * m_members)
        run = lambda k: epoch(stacked, k)  # noqa: E731
    else:
        quant = None
        if mode == "eval_int8":
            from probunet_tpu.ops.quantize import calibrate_elbo
            quant = calibrate_elbo(model, params, batches[:4], cfg, stats,
                                   key=jax.random.key(99))
        eval_step = make_eval_step(model, cfg, quant=quant)
        key = jax.random.key(0)
        stacked = jnp.stack(batches)

        @jax.jit
        def epoch(hrs, key):
            def body(carry, inp):
                hr_b, i = inp
                m = eval_step(params, jax.random.fold_in(key, i), hr_b, stats)
                return carry + m["loss"], None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  (hrs, jnp.arange(hrs.shape[0])))
            return acc

        compiled = eval_step.lower(params, key, batches[0], stats).compile()
        unit = ("samples/s", bs)
        run = lambda k: epoch(stacked, k)  # noqa: E731

    return compiled, run, unit, nb


def measure(mode: str, bs: int):
    compiled, run, (unit, per_batch), nb = build(mode, bs)
    flops, hbm = _cost(compiled)
    key = jax.random.key(7)
    acc = run(key)
    _sync(acc)
    n_reps = 8
    t0 = time.perf_counter()
    for i in range(n_reps):
        acc = run(jax.random.fold_in(key, i))
    _sync(acc)
    dt = time.perf_counter() - t0
    t_batch = dt / (n_reps * nb)
    t_mxu = flops / PEAK_FLOPS
    t_hbm = hbm / HBM_BW
    floor = max(t_mxu, t_hbm)
    rate = per_batch / t_batch
    print(f"\n=== {mode} (bs={bs}) ===")
    print(f"flops/batch = {flops/1e12:.3f} TF   HBM bytes/batch = "
          f"{hbm/1e9:.3f} GB   intensity = {flops/max(hbm,1):.1f} FLOP/B "
          f"(ridge {PEAK_FLOPS/HBM_BW:.0f})")
    print(f"t_mxu = {t_mxu*1e3:7.2f} ms   t_hbm = {t_hbm*1e3:7.2f} ms   "
          f"binding: {'HBM' if t_hbm > t_mxu else 'MXU'}")
    print(f"measured = {t_batch*1e3:7.2f} ms/batch  ({rate:,.0f} {unit})  "
          f"= {t_batch/floor:.2f}x its own floor")
    print(f"ceiling at 100% of binding floor = {per_batch/floor:,.0f} {unit}")
    print("top HBM movers (bytes include operands+output):")
    for byt, kind, op_name in _top_movers(compiled):
        print(f"  {byt/1e6:9.1f} MB  {kind:<12} {classify(op_name):<22} "
              f"{op_name[-70:]}")
    return {"mode": mode, "bs": bs, "flops": flops, "hbm_bytes": hbm,
            "t_mxu_ms": t_mxu * 1e3, "t_hbm_ms": t_hbm * 1e3,
            "measured_ms": t_batch * 1e3, "rate": rate, "unit": unit,
            "x_floor": t_batch / floor,
            "ceiling_rate": per_batch / floor}


def main():
    modes = sys.argv[1:] or ["ensemble", "ensemble_int8", "eval", "eval_int8"]
    bs = int(os.environ.get("BENCH_BS", "128"))
    out = [measure(m, bs) for m in modes]
    print("\n" + json.dumps(out))


if __name__ == "__main__":
    main()
