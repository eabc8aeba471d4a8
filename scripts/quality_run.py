"""Flagship convergence run on device-resident synthetic ClimEx data.

Reproduces the shape of the reference's training trajectory
(reference src/notebooks/test_prob_unet.ipynb cell 2: train afCRPS
0.1476 -> 0.1002 over 30 epochs; KL ~1790 -> ~840 during warm-up, then to
0.015-0.03 once beta_1 > 0 — BASELINE.md) on the flagship config: 3-var
128x128, latent 32, M=15 afCRPS ELBO, bs=32, beta_1 annealed after warm-up
(reference src/main.py:112-155 semantics).

Synthetic fields stand in for the private ClimEx archive, so absolute
values are not comparable — the check is the qualitative trajectory
(monotone recon descent; KL collapse once the beta_1 penalty activates) and
sustained flagship throughput. Everything (data, batches, state) lives on
device.

Usage: python scripts/quality_run.py [--epochs 30] [--years 2]
Writes quality_run.json + loss_curves_quality.png to --outdir.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--years", type=int, default=2, help="synthetic train years")
    ap.add_argument("--outdir", default="results/quality")
    ap.add_argument("--warmup-epochs", type=int, default=20)
    ap.add_argument("--max-beta1", type=float, default=1e-3)
    ap.add_argument("--batch-size", type=int, default=0,
                    help="0 = preset default (32, the reference's setting); "
                         "128 = the shipped throughput-optimal batch "
                         "(VERDICT r3 #4: measure END-TO-END flagship "
                         "training at bs=128 against the isolated bench)")
    ap.add_argument("--remat", default="",
                    help='"" | save_convs | save_convs_all')
    ap.add_argument("--grad-clip", type=float, default=0.0,
                    help="global-norm gradient clip; bs=128 NaN'd at the "
                         "beta_1 activation shock without it (r4 queue 3)")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    from probunet_tpu.config import preset
    from probunet_tpu.data.climex import compute_stats
    from probunet_tpu.data.synthetic import synthetic_climex_fields_device
    from probunet_tpu.data.transforms import apply_physical_transform
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.train.loop import make_elbo_loss_fn, make_train_step
    from probunet_tpu.train.state import create_train_state

    cfg = preset("probunet_multivar_128")
    cfg.model.compute_dtype = "bfloat16"
    if args.batch_size:
        cfg.train.batch_size = args.batch_size
    if args.remat:
        cfg.train.remat = args.remat
    b = cfg.train.batch_size
    res = cfg.data.resolution

    n_train = 365 * args.years
    n_val = 365 // 2
    hr_train = synthetic_climex_fields_device(
        n_train, res[0], res[1], cfg.data.variables, seed=0)
    hr_val = synthetic_climex_fields_device(
        n_val, res[0], res[1], cfg.data.variables, seed=1)
    tf = jax.jit(lambda a: apply_physical_transform(a, cfg.data.variables))
    hr_train, hr_val = tf(hr_train), tf(hr_val)
    stats = jax.jit(lambda a: compute_stats(a, cfg.data.lowres_scale))(hr_train)
    val_stats = jax.jit(lambda a: compute_stats(a, cfg.data.lowres_scale))(hr_val)

    model = ProbabilisticUNet(
        input_channels=3, num_classes=3, latent_dim=cfg.model.latent_dim,
        num_filters=cfg.model.num_filters,
        model_channels=cfg.model.model_channels,
        channel_mult=cfg.model.channel_mult, img_resolution=res,
        num_blocks=cfg.model.num_blocks, dropout=cfg.model.dropout,
        dtype=jnp.bfloat16,
        remat=cfg.train.remat,
    )
    x = jnp.zeros((b, res[0], res[1], 3), jnp.float32)
    state = create_train_state(model, x, x, seed=cfg.train.seed,
                               lr=cfg.train.lr, grad_clip=args.grad_clip)
    step = make_train_step(model, cfg)
    eval_loss = jax.jit(make_elbo_loss_fn(model, cfg, training=False))

    steps_per_epoch = n_train // b
    rng = np.random.default_rng(cfg.train.seed)
    history = {"train_recon": [], "train_kl": [], "val_recon": [],
               "val_kl": [], "beta_1": []}
    t_all = time.time()
    for epoch in range(1, args.epochs + 1):
        # beta schedule (reference src/main.py:112-155): beta_1 = 0 during
        # warm-up, then linear ramp to max_beta1
        if epoch <= args.warmup_epochs:
            beta_1 = 0.0
        else:
            frac = (epoch - args.warmup_epochs) / max(
                1, args.epochs - args.warmup_epochs)
            beta_1 = args.max_beta1 * min(1.0, frac)
        b1 = jnp.float32(beta_1)
        b0 = jnp.float32(1.0)

        perm = rng.permutation(n_train)[: steps_per_epoch * b]
        perm = jnp.asarray(perm.reshape(steps_per_epoch, b))
        recons, kls = [], []
        t0 = time.time()
        for i in range(steps_per_epoch):
            batch = jnp.take(hr_train, perm[i], axis=0)
            state, m = step(state, batch, stats, b0, b1)
            recons.append(m["recon"]); kls.append(m["kl_mean"])
        tr = float(jnp.mean(jnp.stack(recons)))
        tk = float(jnp.mean(jnp.stack(kls)))
        dt = time.time() - t0

        # validation (M = eval_ensemble_size, posterior ELBO like reference)
        v_recons, v_kls = [], []
        for i in range(0, n_val - b + 1, b * 2):
            _, vm = eval_loss(state.params, jax.random.key(epoch * 131 + i),
                              hr_val[i:i + b], val_stats, b0,
                              jnp.float32(0.0))
            v_recons.append(vm["recon"]); v_kls.append(vm["kl_mean"])
        vr = float(jnp.mean(jnp.stack(v_recons)))
        vk = float(jnp.mean(jnp.stack(v_kls)))

        history["train_recon"].append(tr); history["train_kl"].append(tk)
        history["val_recon"].append(vr); history["val_kl"].append(vk)
        history["beta_1"].append(beta_1)
        print(json.dumps({
            "epoch": epoch, "train_recon": round(tr, 4),
            "train_kl": round(tk, 3), "val_recon": round(vr, 4),
            "val_kl": round(vk, 3), "beta_1": beta_1,
            "samples_per_sec": round(steps_per_epoch * b / dt, 1),
        }), flush=True)

    total_wall = time.time() - t_all
    out = {
        "config": f"probunet_multivar_128 + bf16, bs={b}"
                  + (f", remat={cfg.train.remat}" if cfg.train.remat else "")
                  + (f", grad_clip={args.grad_clip}" if args.grad_clip else ""),
        "epochs": args.epochs,
        "total_minutes": round(total_wall / 60, 2),
        # END-TO-END rate: train samples / total wall INCLUDING per-epoch
        # eval, host metric pulls, and logging — the number VERDICT r3 #4
        # asks to compare against the isolated bench step rate
        "end_to_end_samples_per_sec": round(
            args.epochs * steps_per_epoch * b / total_wall, 1),
        "history": history,
        "first_last_train_recon": [history["train_recon"][0],
                                   history["train_recon"][-1]],
        "kl_at_warmup_end": history["train_kl"][args.warmup_epochs - 1]
        if args.epochs >= args.warmup_epochs else None,
        "kl_final": history["train_kl"][-1],
    }
    with open(os.path.join(args.outdir, "quality_run.json"), "w") as f:
        json.dump(out, f, indent=2)
    try:
        from probunet_tpu.utils.plotting import plot_loss_curves
        plot_loss_curves(
            {"train_crps": history["train_recon"], "train_kl": history["train_kl"],
             "val_crps": history["val_recon"], "val_kl": history["val_kl"]},
            save_path=os.path.join(args.outdir, "loss_curves_quality.png"),
        )
    except Exception as e:
        print(f"plotting skipped: {e}")
    print(json.dumps({"done": out["first_last_train_recon"],
                      "kl": [out["kl_at_warmup_end"], out["kl_final"]]}))


if __name__ == "__main__":
    main()
