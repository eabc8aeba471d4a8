"""HBM-bandwidth roofline proof for the flagship train step.

The per-level profile (DESIGN.md) showed no level sits at its MXU
lane-fill bound and attributed the gap to HBM-bound GroupNorm/FiLM/SiLU
chains between convs. This script closes the argument quantitatively:
it reads BOTH resource totals of the compiled step from XLA's cost
analysis — FLOPs and bytes accessed — and compares the measured step
time against each floor:

    t_mxu = flops / (peak MXU FLOP/s x lane_fill-weighted ceiling)
    t_hbm = bytes / HBM bandwidth

If measured time ~= max(t_mxu, t_hbm) the step is AT its hardware
roofline and no scheduling/fusion lever is left — only algebraic ones
(fewer bytes or fewer MACs), which are parity-constrained.

"bytes accessed" is computed on the optimized (post-fusion) HLO:
fusion internals don't count, only buffers that actually cross HBM
(modulo VMEM residency between adjacent fusions, which makes the floor
slightly conservative).

v5e public specs: 197 TFLOP/s bf16, 819 GB/s HBM.

Usage: python scripts/hbm_roofline.py [bs]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

PEAK_FLOPS = 197e12
HBM_BW = 819e9


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
    state = create_train_state(model, x, y, seed=cfg.train.seed,
                               lr=cfg.train.lr)
    step = make_train_step(model, cfg)
    b0, b1 = jnp.float32(1.0), jnp.float32(1e-3)

    compiled = step.lower(state, hr, stats, b0, b1).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca["flops"])
    hbm_bytes = float(ca.get("bytes accessed", 0.0))

    # measured step time, honest host-read sync (see bench.py)
    for _ in range(2):
        state, metrics = step(state, hr, stats, b0, b1)
    float(jax.device_get(jnp.ravel(metrics["grad_norm"])[0]))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, hr, stats, b0, b1)
    float(jax.device_get(jnp.ravel(metrics["grad_norm"])[0]))
    t_meas = (time.perf_counter() - t0) / n

    t_mxu = flops / PEAK_FLOPS
    t_hbm = hbm_bytes / HBM_BW
    floor = max(t_mxu, t_hbm)
    print(f"bs={bs}  flops/step = {flops/1e12:.2f} TF   "
          f"HBM bytes/step = {hbm_bytes/1e9:.2f} GB")
    print(f"t_mxu floor = {t_mxu*1e3:7.2f} ms   (100% MXU, 100% lane fill)")
    print(f"t_hbm floor = {t_hbm*1e3:7.2f} ms   (100% of 819 GB/s)")
    print(f"measured    = {t_meas*1e3:7.2f} ms   "
          f"({bs/t_meas:.1f} samples/s)")
    print(f"roofline: measured / max(floors) = {t_meas/floor:.2f}x  "
          f"(binding resource: {'HBM' if t_hbm > t_mxu else 'MXU'})")
    print(f"arithmetic intensity = {flops/hbm_bytes:.1f} FLOP/byte "
          f"(ridge at {PEAK_FLOPS/HBM_BW:.0f})")


if __name__ == "__main__":
    main()
