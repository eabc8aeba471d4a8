"""Dump the flagship train step's optimized HLO and rank the big
HBM-resident ops (concatenate / copy / transpose / fusion outputs).

Used to decide whether a concat-free decoder (split-conv form, like
models/fcomb.py's split matmul) would save real HBM traffic, or whether
XLA already fuses the skip-concats away.

Usage: python scripts/hlo_traffic.py [bs]
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
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
        dtype=jnp.bfloat16,
        remat=cfg.train.remat,
    )
    hr = synthetic_climex_fields_device(bs, res[0], res[1],
                                        cfg.data.variables, seed=0)
    hr = jax.jit(lambda a: apply_physical_transform(a, cfg.data.variables))(hr)
    stats = jax.jit(lambda a: compute_stats(a, cfg.data.lowres_scale))(hr)
    x = jnp.zeros((bs, res[0], res[1], cfg.model.input_channels), jnp.float32)
    y = jnp.zeros((bs, res[0], res[1], cfg.model.num_classes), jnp.float32)
    print("creating state...", flush=True)
    state = create_train_state(model, x, y, seed=cfg.train.seed,
                               lr=cfg.train.lr)
    print("state created", flush=True)
    step = make_train_step(model, cfg)
    b0 = jnp.float32(1.0)
    b1 = jnp.float32(1e-3)
    print("lowering...", flush=True)
    lowered = step.lower(state, hr, stats, b0, b1)
    print("compiling...", flush=True)
    compiled = lowered.compile()
    print("fetching HLO text...", flush=True)
    txt = compiled.as_text()
    print(f"HLO text: {len(txt)} chars, {txt.count(chr(10))} lines")

    dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                "f16": 2, "s8": 1, "u8": 1}

    def shape_bytes(shape: str) -> int:
        m = re.match(r"(\w+)\[([\d,]*)\]", shape)
        if not m:
            return 0
        dt, dims = m.groups()
        n = 1
        for d in dims.split(",") if dims else []:
            n *= int(d)
        return n * dt_bytes.get(dt, 4)

    # op kinds that force an HBM materialization of their output
    agg = defaultdict(lambda: [0, 0])
    rows = []
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.-]+ = (\S+) (\w+)\(", line)
        if not m:
            continue
        shape, op = m.groups()
        if op in ("concatenate", "copy", "transpose", "reshape",
                  "convolution", "fusion", "custom-call"):
            b = shape_bytes(shape)
            agg[op][0] += 1
            agg[op][1] += b
            if b >= 64 * 1024 * 1024 and op in ("concatenate", "copy",
                                                "transpose"):
                rows.append((b, op, line.strip()[:160]))

    print("\nop-kind totals (count, GB of outputs):")
    for op, (n, b) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {op:14s} n={n:4d}  {b/1e9:7.2f} GB")

    rows.sort(reverse=True)
    print(f"\nlayout-ops with outputs >= 64 MB ({len(rows)}):")
    for b, op, line in rows[:40]:
        print(f"  {b/1e6:8.1f} MB  {line}")


if __name__ == "__main__":
    main()
