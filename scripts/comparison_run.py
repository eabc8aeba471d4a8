"""Model-family comparison on common synthetic data (results.ipynb cell 14
analog): Prob-U-Net (afCRPS ELBO) vs deterministic U-Net vs LinearCNN vs
BCSD vs the interpolation baseline, test CRPS/MAE per variable in real
units. Runs device-resident on the accelerator; writes RESULTS_TABLE.json
and a markdown table.

Usage: python scripts/comparison_run.py [--epochs 12] [--outdir results/compare]
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
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--members", type=int, default=16)
    ap.add_argument("--outdir", default="results/compare")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    from probunet_tpu.config import preset
    from probunet_tpu.data.climex import (
        compute_stats, preprocess_batch, residual_to_hr,
    )
    from probunet_tpu.data.synthetic import synthetic_climex_fields_device
    from probunet_tpu.data.transforms import (
        apply_physical_transform, invert_physical_transform,
    )
    from probunet_tpu.evals import compute_mae, crps_over_groundtruth
    from probunet_tpu.models.baselines import LinearCNN, bcsd
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.models.unet import UNetAll
    from probunet_tpu.train.loop import (
        make_deterministic_train_step, make_train_step,
    )
    from probunet_tpu.train.state import create_train_state

    cfg = preset("probunet_multivar_128")
    cfg.model.compute_dtype = "bfloat16"
    b, res = cfg.train.batch_size, cfg.data.resolution
    variables = cfg.data.variables
    k = cfg.data.lowres_scale

    n_train, n_test = 365 * 2, 365
    tf = jax.jit(lambda a: apply_physical_transform(a, variables))
    hr_train = tf(synthetic_climex_fields_device(n_train, *res, variables, 0))
    hr_test = tf(synthetic_climex_fields_device(n_test, *res, variables, 7))
    stats = jax.jit(lambda a: compute_stats(a, k))(hr_train)
    test_stats = jax.jit(lambda a: compute_stats(a, k))(hr_test)
    steps_per_epoch = n_train // b
    rng = np.random.default_rng(0)

    def epochs_one(state, step_fn, extra):
        perm = jnp.asarray(
            rng.permutation(n_train)[: steps_per_epoch * b].reshape(
                steps_per_epoch, b))
        for i in range(steps_per_epoch):
            state, _ = step_fn(state, jnp.take(hr_train, perm[i], axis=0),
                               stats, *extra)
        return state

    def epochs(state, step_fn, extra):
        for ep in range(args.epochs):
            state = epochs_one(state, step_fn, extra)
        return state

    results = {}

    def add_result(name, ens):
        """ens: (T, M, H, W, C) HR predictions in storage space."""
        gt = invert_physical_transform(hr_test[: ens.shape[0]], variables)
        ens = invert_physical_transform(ens, variables)
        crps = crps_over_groundtruth(ens, gt)
        mae = compute_mae(ens, gt)
        results[name] = {
            "crps": dict(zip(variables, np.asarray(crps["mean"]).round(4).tolist())),
            "mae": dict(zip(variables, np.asarray(mae["mean"]).round(4).tolist())),
        }
        print(json.dumps({name: results[name]}), flush=True)

    n_eval = 128  # test days evaluated (memory: T*M fields)

    # ---- interpolation baseline (reference results.ipynb cell 13) --------
    batch = preprocess_batch(hr_test[:n_eval], test_stats, cfg.data.pipeline, k)
    add_result("interp_baseline", batch["lrinterp"][:, None])

    # ---- BCSD (needs >= 1 whole test year for its doy climatology) --------
    train_li = preprocess_batch(hr_train, stats, cfg.data.pipeline, k)["lrinterp"]
    test_li_full = preprocess_batch(hr_test, test_stats, cfg.data.pipeline,
                                    k)["lrinterp"]
    pred = bcsd(hr_train, train_li, test_li_full)
    add_result("bcsd", pred[:n_eval, None])

    # ---- LinearCNN -------------------------------------------------------
    t0 = time.time()
    lin = LinearCNN(in_channels=3)
    x = jnp.zeros((b, *res, 3), jnp.float32)
    state = create_train_state(lin, x, None, seed=0, lr=1e-3,
                               init_method="__call__")
    state = epochs(state, make_deterministic_train_step(lin, cfg), ())
    pred = jax.jit(lambda p, hb: residual_to_hr(
        lin.apply({"params": p}, preprocess_batch(
            hb, test_stats, cfg.data.pipeline, k)["inputs"]),
        preprocess_batch(hb, test_stats, cfg.data.pipeline, k)["lrinterp"],
        test_stats, cfg.data.pipeline))(state.params, hr_test[:n_eval])
    add_result("linearcnn", pred[:, None])
    print(f"linearcnn trained in {time.time()-t0:.0f}s", flush=True)

    # ---- deterministic U-Net ----------------------------------------------
    t0 = time.time()
    det = UNetAll(type="symmetric", img_resolution=res, in_channels=3,
                  ds_scale=k, num_res_blocks=cfg.model.num_blocks,
                  channel_mult=cfg.model.channel_mult, out_channels=3,
                  model_channels=cfg.model.model_channels,
                  dropout=cfg.model.dropout, dtype=jnp.bfloat16)
    state = create_train_state(det, x, None, seed=0, lr=cfg.train.lr,
                               init_method="__call__")
    state = epochs(state, make_deterministic_train_step(det, cfg), ())
    pred = jax.jit(lambda p, hb: residual_to_hr(
        det.apply({"params": p}, preprocess_batch(
            hb, test_stats, cfg.data.pipeline, k)["inputs"]),
        preprocess_batch(hb, test_stats, cfg.data.pipeline, k)["lrinterp"],
        test_stats, cfg.data.pipeline))(state.params, hr_test[:n_eval])
    add_result("deterministic_unet", pred[:, None])
    print(f"deterministic unet trained in {time.time()-t0:.0f}s", flush=True)

    # ---- Probabilistic U-Net (afCRPS ELBO) ---------------------------------
    t0 = time.time()
    prob = ProbabilisticUNet(
        input_channels=3, num_classes=3, latent_dim=cfg.model.latent_dim,
        num_filters=cfg.model.num_filters,
        model_channels=cfg.model.model_channels,
        channel_mult=cfg.model.channel_mult, img_resolution=res,
        num_blocks=cfg.model.num_blocks, dropout=cfg.model.dropout,
        dtype=jnp.bfloat16)
    state = create_train_state(prob, x, x, seed=0, lr=cfg.train.lr)
    # beta_1 > 0 after a short warm-up: prior sampling is unusable without
    # the KL(q||p) penalty that pulls the prior onto the posterior (the
    # reference's annealing, src/main.py:112-155; see QUALITY.md)
    step_fn = make_train_step(prob, cfg)
    for ep in range(args.epochs):
        beta_1 = 0.0 if ep < args.epochs // 3 else 1e-3
        state = epochs_one(state, step_fn,
                           (jnp.float32(1.0), jnp.float32(beta_1)))

    @jax.jit
    def sample_hr(params, hb, key):
        bt = preprocess_batch(hb, test_stats, cfg.data.pipeline, k)
        out = prob.apply({"params": params}, bt["inputs"],
                         num_samples=args.members,
                         method=ProbabilisticUNet.sample,
                         rngs={"latent": key})
        return residual_to_hr(out, bt["lrinterp"][:, None], test_stats,
                              cfg.data.pipeline)

    chunks = []
    for i in range(0, n_eval, 32):
        chunks.append(np.asarray(sample_hr(
            state.params, hr_test[i:i + 32], jax.random.key(i))))
    add_result("probunet_afcrps_M16", jnp.asarray(np.concatenate(chunks)))
    print(f"probunet trained in {time.time()-t0:.0f}s", flush=True)

    with open(os.path.join(args.outdir, "RESULTS_TABLE.json"), "w") as f:
        json.dump(results, f, indent=2)

    lines = ["| model | " + " | ".join(
        f"CRPS {v} | MAE {v}" for v in variables) + " |"]
    lines.append("|" + "---|" * (1 + 2 * len(variables)))
    for name, r in results.items():
        cells = []
        for v in variables:
            cells += [f"{r['crps'][v]:.3f}", f"{r['mae'][v]:.3f}"]
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
    table = "\n".join(lines)
    with open(os.path.join(args.outdir, "RESULTS_TABLE.md"), "w") as f:
        f.write(table + "\n")
    print(table)


if __name__ == "__main__":
    main()
