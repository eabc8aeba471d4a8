"""Command-line entry points.

One consistent CLI replacing the reference's five scripts (src/main.py,
src/deterministic_unet_main.py, src/baseline/main.py,
src/latent_exploration*.py — SURVEY.md §1 L5, including their API drift:
the reference's deterministic driver passes kwargs its own dataset no
longer accepts, src/deterministic_unet_main.py:42-44):

    python -m probunet_tpu train        --preset probunet_multivar_128
    python -m probunet_tpu train-det    --preset deterministic_64
    python -m probunet_tpu explore      --ckpt ... [--posterior|--single]
    python -m probunet_tpu evaluate     --ckpt ... --members 16
    python -m probunet_tpu extremes     --ckpt ... --pixels 20,45
    python -m probunet_tpu infer-domain --preset fulldomain_dp8
    python -m probunet_tpu sweep        --grid train.batch_size=16,32
    python -m probunet_tpu pack         --split train --out train.npz
    python -m probunet_tpu bench

Config = named preset + dotted overrides (--set train.lr=3e-4), the typed
replacement for the reference's argparse-with-Python-object-defaults
(reference src/train_prob_unet_model.py:26-28,53).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np

from probunet_tpu.config import PRESETS, Config, preset


class _PhaseTimer:
    """Wall-clock phase breakdown for the long serve CLIs ("[timing]" line).

    Round 5: the full-scale int8 ledger runs came back slower than bf16 in
    wall-clock with no device-side explanation (QUALITY.md "int8 serving
    accuracy ledger" — the device consumes the whole job in seconds);
    this records where the host time actually goes so the next ledger run
    decomposes itself."""

    def __init__(self):
        import time
        self._now = time.time
        self.t0 = self.last = self._now()
        self.spans = {}

    def mark(self, name):
        now = self._now()
        self.spans[name] = self.spans.get(name, 0.0) + now - self.last
        self.last = now

    def report(self):
        parts = " ".join(f"{k}={v:.1f}s" for k, v in self.spans.items())
        print(f"[timing] {parts} total={self._now() - self.t0:.1f}s",
              flush=True)


def _parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        key, _, val = p.partition("=")
        try:
            out[key] = json.loads(val)
        except json.JSONDecodeError:
            out[key] = val
    return out


def build_config(args) -> Config:
    cfg = preset(args.preset) if args.preset else Config()
    if getattr(args, "config", None):
        with open(args.config) as f:
            cfg = Config.from_dict(json.load(f))
    return cfg.override(_parse_overrides(args.set))


def make_datasets(cfg: Config, splits=(0, 1, 2)):
    """Build the requested dataset splits; unrequested entries are None.

    Eager three-way construction cost the full-scale `evaluate` run a
    31 GB host-RSS peak building the 60-year train split it never read
    (r4 queue phase 3) — commands that touch only one split must say so."""
    from probunet_tpu.data.climex import ClimexDataset

    packed = (cfg.data.packed_train, cfg.data.packed_val,
              cfg.data.packed_test)

    def mk(years, split_idx):
        if split_idx not in splits:
            return None
        return ClimexDataset(
            datadir=cfg.data.datadir or None,
            years=range(*years),
            variables=cfg.data.variables,
            coords=cfg.data.coords,
            pipeline=cfg.data.pipeline,
            lowres_scale=cfg.data.lowres_scale,
            transfo=cfg.data.transfo,
            megafile=cfg.data.megafile,
            interp_mode=cfg.data.interp_mode,
            epsilon=cfg.data.epsilon,
            synthetic=cfg.data.synthetic,
            # distinct synthetic fields per split (a shared seed would make
            # train == test and every score degenerate)
            synthetic_seed=cfg.data.synthetic_seed + split_idx,
            standardization=cfg.data.standardization,
            # packed artifacts (from `probunet_tpu pack`) win over the
            # other sources: memory-mapped, O(1) construction
            packed=packed[split_idx] or None,
        )

    return (mk(cfg.data.years_train, 0), mk(cfg.data.years_val, 1),
            mk(cfg.data.years_test, 2))


def make_model(cfg: Config):
    import jax.numpy as jnp

    from probunet_tpu.models.prob_unet import ProbabilisticUNet

    dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else None
    return ProbabilisticUNet(
        input_channels=cfg.model.input_channels,
        num_classes=cfg.model.num_classes,
        latent_dim=cfg.model.latent_dim,
        num_filters=cfg.model.num_filters,
        model_channels=cfg.model.model_channels,
        channel_mult=cfg.model.channel_mult,
        img_resolution=cfg.data.resolution,
        num_blocks=cfg.model.num_blocks,
        dropout=cfg.model.dropout,
        dtype=dtype,
        remat=tuple(cfg.train.remat_levels) or cfg.train.remat,
    )


# ---------------------------------------------------------------------------
# Subcommands
# ---------------------------------------------------------------------------

def cmd_train(args):
    """Probabilistic U-Net ELBO training (reference src/main.py driver)."""
    from probunet_tpu.train.checkpoint import CheckpointManager
    from probunet_tpu.train.logging import MetricLogger
    from probunet_tpu.train.loop import Trainer

    cfg = build_config(args)
    os.makedirs(args.outdir, exist_ok=True)
    with open(os.path.join(args.outdir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    ds_train, ds_val, _ = make_datasets(cfg, splits=(0, 1))
    model = make_model(cfg)
    logger = MetricLogger(logdir=args.outdir, use_wandb=args.wandb)
    ckpt = CheckpointManager(os.path.join(os.path.abspath(args.outdir), "ckpt"))
    mesh = None
    if args.dp:
        import jax

        from probunet_tpu.parallel.mesh import make_mesh
        n = len(jax.devices()) if args.dp == -1 else args.dp
        mesh = make_mesh(n_data=n)
        print(f"data-parallel over {dict(mesh.shape)}")
    trainer = Trainer(cfg, model, ds_train, ds_val, logger=logger,
                      checkpoint_manager=ckpt,
                      plot_dir=args.outdir if args.plot_every else None,
                      plot_every=args.plot_every or 1,
                      mesh=mesh)
    if getattr(args, "resume", False):
        # full train-state resume (params+opt+step+rng) — a capability the
        # reference lacks entirely (end-of-run torch.save only, SURVEY.md §5)
        latest = ckpt.latest_step()
        if latest is not None:
            trainer.state, _ = ckpt.restore(trainer.state, latest)
            print(f"resumed from step {latest}")
        else:
            print("no checkpoint found; training from scratch")
    history = trainer.fit()
    with open(os.path.join(args.outdir, "losses.pkl"), "wb") as f:
        pickle.dump(history, f)  # the losses.pkl artifact (src/main.py:216)

    # improvement over plain interpolation
    # (reference src/train_prob_unet_model.py:307-349)
    try:
        from probunet_tpu.evals import residual_contribution
        hr_pred, hr, lrinterp, *_ = trainer.sample_ensemble(
            num_items=min(32, len(ds_val or ds_train)), num_samples=4
        )
        contrib = residual_contribution(hr_pred, lrinterp, hr)
        print(json.dumps({"residual_contribution": contrib}))
    except Exception as e:
        print(f"residual-contribution analysis skipped: {e}")
    try:
        from probunet_tpu.utils.plotting import plot_loss_curves
        plot_loss_curves(history,
                         save_path=os.path.join(args.outdir, "loss_curves.png"))
    except Exception as e:  # plotting must never kill a finished run
        print(f"plotting skipped: {e}")
    print(json.dumps({"final": {k: (v[-1] if v else None)
                                for k, v in history.items()}}))


def cmd_train_det(args):
    """Deterministic baselines: UNet / LinearCNN / BCSD
    (reference src/baseline/main.py, src/trainmodel.py)."""
    import jax
    import jax.numpy as jnp

    from probunet_tpu.data.loader import Batches, prefetch_to_device
    from probunet_tpu.train.loop import make_deterministic_train_step
    from probunet_tpu.train.state import create_train_state

    cfg = build_config(args)
    os.makedirs(args.outdir, exist_ok=True)
    ds_train, ds_val, ds_test = make_datasets(cfg)

    if args.model == "bcsd":
        from probunet_tpu.models.baselines import bcsd

        train_lrinterp = ds_train.preprocess(jnp.asarray(ds_train.hr))["lrinterp"]
        test_batch = ds_test.preprocess(jnp.asarray(ds_test.hr))
        pred = bcsd(
            train_hr=jnp.asarray(ds_train.hr),
            train_lrinterp=train_lrinterp,
            test_lrinterp=test_batch["lrinterp"],
        )
        mae = float(jnp.abs(pred - test_batch["hr"][: pred.shape[0]]).mean())
        print(json.dumps({"model": "bcsd", "test_mae": mae}))
        return

    if args.model == "linearcnn":
        from probunet_tpu.models.baselines import LinearCNN
        model = LinearCNN(in_channels=cfg.model.num_classes)
    else:
        from probunet_tpu.models.unet import UNetAll
        model = UNetAll(
            type=cfg.model.unet_type,
            img_resolution=cfg.data.resolution,
            in_channels=cfg.model.input_channels,
            ds_scale=cfg.data.lowres_scale,
            num_res_blocks=cfg.model.num_blocks,
            channel_mult=cfg.model.channel_mult,
            out_channels=cfg.model.num_classes,
            model_channels=cfg.model.model_channels,
            dropout=cfg.model.dropout,
        )

    res = cfg.data.resolution
    x = jnp.zeros((cfg.train.batch_size, res[0], res[1],
                   cfg.model.input_channels))
    state = create_train_state(model, x, None, seed=cfg.train.seed,
                               lr=cfg.train.lr,
                               weight_decay=cfg.train.weight_decay,
                               init_method="__call__")
    step = make_deterministic_train_step(model, cfg)
    stats = jax.tree.map(jnp.asarray, ds_train.stats)
    for epoch in range(1, cfg.train.num_epochs + 1):
        batches = Batches(len(ds_train), cfg.train.batch_size, shuffle=True,
                          seed=cfg.train.seed + epoch)
        losses = []
        it = (ds_train.get_hr_batch(i) for i in batches)
        for hr in prefetch_to_device(it):
            state, metrics = step(state, hr, stats)
            losses.append(metrics["loss"])
        print(f"epoch {epoch}: mse={float(jnp.mean(jnp.stack(losses))):.5f}")

    # final real-units per-variable MAE on the test split, reconstructing
    # HR = lrinterp + unstandardized residual and inverting the physical
    # transforms (reference trainmodel.py:237-305 `reconstruct=True` eval +
    # baseline/main.py:113-117 final MAE report)
    from probunet_tpu.data.transforms import invert_physical_transform

    from probunet_tpu.data.climex import lrinterp_from_batch

    @jax.jit
    def predict_hr(params, hr_batch):
        batch = ds_test.preprocess(hr_batch)
        pred = model.apply({"params": params}, batch["inputs"], train=False)
        hr_pred = ds_test.residual_to_hr(
            pred,
            lrinterp_from_batch(batch, cfg.data.lowres_scale,
                                cfg.data.interp_mode),
            item_stats=batch.get("stand_stats"),
        )
        gt = batch["hr"]
        if cfg.data.transfo:
            hr_pred = invert_physical_transform(hr_pred, cfg.data.variables)
            gt = invert_physical_transform(gt, cfg.data.variables)
        err = jnp.abs(hr_pred - gt)
        return err.mean(axis=tuple(range(err.ndim - 1)))  # (C,)

    maes = []
    for idx in Batches(min(len(ds_test), 512), cfg.train.batch_size):
        maes.append(predict_hr(state.params,
                               jnp.asarray(ds_test.get_hr_batch(idx))))
    mae = np.asarray(jnp.stack(maes).mean(axis=0))
    print(json.dumps({
        "model": args.model, "epochs": cfg.train.num_epochs,
        "test_mae_real_units": dict(zip(cfg.data.variables, mae.tolist())),
    }))


def cmd_explore(args):
    """Latent exploration (reference src/latent_exploration*.py)."""
    import jax
    import jax.numpy as jnp

    from probunet_tpu.analysis import (
        LatentPCA, collapse_diagnostics, collect_latents, decode_latent_grid,
        format_summary, pc_grid_deciles, pc_grid_sigma, single_prior_sweep,
    )
    from probunet_tpu.analysis.latent import grid_to_z, save_artifacts
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.train.checkpoint import CheckpointManager

    cfg = build_config(args)
    os.makedirs(args.outdir, exist_ok=True)
    _, _, ds_test = make_datasets(cfg, splits=(2,))
    model = make_model(cfg)

    res = cfg.data.resolution
    x = jnp.zeros((1, res[0], res[1], cfg.model.input_channels))
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, x, x
    )["params"]
    if args.ckpt:
        params = CheckpointManager(os.path.abspath(args.ckpt)).restore_best(params)

    if args.single:
        sweep = single_prior_sweep(model, params, ds_test, n=6, span=6.0)
        from probunet_tpu.utils.plotting import plot_latent_grid
        plot_latent_grid(sweep["decoded"],
                         title=f"prior sweep dims {sweep['dims']}",
                         save_path=os.path.join(args.outdir, "prior_sweep.png"))
        # HR-space grids (per-panel AND globally normalized) + the
        # delta-to-center grid, as the reference's single-sample sweep
        # emits them (reference src/latent_explore_single_prior.py:183-243)
        from probunet_tpu.data.climex import lrinterp_from_batch
        batch0 = ds_test.preprocess(
            jnp.asarray(ds_test.get_hr_batch(np.array([0]))))
        lrinterp0 = lrinterp_from_batch(batch0, cfg.data.lowres_scale,
                                        cfg.data.interp_mode)
        n = sweep["decoded"].shape[0]
        dec = sweep["decoded"]
        hr_grid = np.asarray(ds_test.residual_to_hr(
            jnp.asarray(dec.reshape(n * n, *dec.shape[2:])), lrinterp0)
        ).reshape(dec.shape)
        hr_center = np.asarray(ds_test.residual_to_hr(
            jnp.asarray(sweep["center"][None]), lrinterp0))[0]
        plot_latent_grid(
            hr_grid, symmetric=False, cmap="viridis",
            title=f"prior sweep HR (global norm) dims {sweep['dims']}",
            save_path=os.path.join(args.outdir, "prior_sweep_hr.png"))
        plot_latent_grid(
            hr_grid, symmetric=False, cmap="viridis", per_panel_norm=True,
            title=f"prior sweep HR (per-panel norm) dims {sweep['dims']}",
            save_path=os.path.join(args.outdir,
                                   "prior_sweep_hr_perpanel.png"))
        plot_latent_grid(
            hr_grid - hr_center[None, None],
            title=f"prior sweep HR delta-to-center dims {sweep['dims']}",
            save_path=os.path.join(args.outdir, "prior_sweep_delta.png"))
        print(json.dumps({"dims": np.asarray(sweep["dims"]).tolist()}))
        return

    lat = collect_latents(model, params, ds_test, use_posterior=args.posterior,
                          max_items=args.max_items)
    pca = LatentPCA.fit(lat["mu"])
    scores = pca.transform(lat["mu"])
    diag = collapse_diagnostics(model, params, ds_test,
                                max_items=args.max_items,
                                n_contexts=args.probe_contexts)
    report = format_summary(diag)
    print(report)
    with open(os.path.join(args.outdir, "summary.txt"), "w") as f:
        f.write(report + "\n")
    save_artifacts(os.path.join(args.outdir, "pca_artifacts.pkl"),
                   pca, lat, diag)

    if scores.shape[1] >= 2:
        # Fig5a: PC1 x PC2 joint hist2d + marginals
        # (reference src/latent_exploration.py:50-79, called at :723)
        from probunet_tpu.utils.plotting import plot_latent_joint_marginal
        plot_latent_joint_marginal(
            scores, pca.explained_variance_ratio,
            title_prefix=("Latent space (posterior)" if args.posterior
                          else "Latent space (prior)"),
            save_path=os.path.join(args.outdir, "latent_joint_marginal.png"),
        )

    # decile + sigma grids decoded against context 0's frozen features,
    # in residual space AND reconstructed HR space (the reference decodes
    # every grid twice — src/latent_exploration.py:119-144 batched_decode_hr,
    # grids emitted at :909-921)
    from probunet_tpu.data.climex import lrinterp_from_batch
    batch = ds_test.preprocess(jnp.asarray(ds_test.get_hr_batch(np.array([0]))))
    feats, _, _ = model.apply({"params": params}, batch["inputs"],
                              method=ProbabilisticUNet.encode)
    lrinterp0 = lrinterp_from_batch(batch, cfg.data.lowres_scale,
                                    cfg.data.interp_mode)
    n = 10 if args.posterior else 7
    for name, grid in (("decile", pc_grid_deciles(scores, n)),
                       ("sigma", pc_grid_sigma(scores, n))):
        zs = grid_to_z(pca, grid, fill_scores=scores)
        dec = decode_latent_grid(model, params, feats, zs)
        h, w, k = dec.shape[1:]
        from probunet_tpu.utils.plotting import plot_latent_grid
        plot_latent_grid(dec.reshape(n, n, h, w, k),
                         title=f"{name} grid (PC1 x PC2)",
                         save_path=os.path.join(args.outdir, f"grid_{name}.png"))
        hr_dec = np.asarray(ds_test.residual_to_hr(jnp.asarray(dec),
                                                   lrinterp0))
        plot_latent_grid(hr_dec.reshape(n, n, h, w, k),
                         symmetric=False, cmap="viridis",
                         title=f"{name} grid, HR space (PC1 x PC2)",
                         save_path=os.path.join(args.outdir,
                                                f"grid_{name}_hr.png"))


def _serve_variables(args, cfg, model, params, ds, n_items, batch_size):
    """``--quant int8``: calibrate per-conv activation scales on the first
    ``--calib-batches`` batches of the VALIDATION split (standard PTQ
    practice — calibrating on the split whose metrics are reported would
    be mild calibration/test leakage; ops/quantize.py, measured +43% on
    the bandwidth-bound ensemble path) and return the full serve-time
    variables dict. Falls back to the serve dataset when the validation
    split is unavailable. ``--quant none`` (default) returns the float
    params untouched."""
    if getattr(args, "quant", "none") != "int8":
        return {"params": params}
    import jax
    import jax.numpy as jnp

    from probunet_tpu.data.loader import Batches
    from probunet_tpu.ops.quantize import calibrate_sample

    calib_ds, split = ds, "serve"
    try:  # built lazily: only the int8 path pays the val split's RSS
        val = make_datasets(cfg, splits=(1,))[1]
        if val is not None and len(val) > 0:
            calib_ds, split = val, "val"
    except Exception as e:
        print(f"int8 serve: val split unavailable ({e}); "
              f"calibrating on the serve split")
    n_avail = len(calib_ds) if split == "val" else n_items
    prep = jax.jit(lambda hr: calib_ds.preprocess(hr)["inputs"])
    n_calib = max(1, getattr(args, "calib_batches", 4))
    inputs = []
    for i, idx in enumerate(Batches(n_avail, batch_size)):
        if i >= n_calib:
            break
        inputs.append(prep(jnp.asarray(calib_ds.get_hr_batch(idx))))
    scales = calibrate_sample(model, params, inputs, num_samples=args.members,
                              key=jax.random.key(cfg.train.seed))
    skip = getattr(args, "quant_skip", None)
    if skip:
        from probunet_tpu.ops.quantize import quant_skip
        n0 = len(jax.tree.leaves(scales))
        scales = quant_skip(scales, skip)
        print(f"int8 serve: --quant-skip {skip} pruned "
              f"{n0 - len(jax.tree.leaves(scales))} of {n0} scales")
    print(f"int8 serve: calibrated {len(jax.tree.leaves(scales))} conv "
          f"scales on {len(inputs)} {split}-split batches")
    return {"params": params, "quant": scales}


def _member_mesh_sampler(args, cfg, model, params, stats, quant=None):
    """``--member-mesh N``: jitted (hr_batch, key) -> (hr_pred, gt) with the
    ensemble sharded over a ("data", "member") mesh
    (parallel/member_parallel.py), physical transforms inverted. Returns
    None when the flag is off; downstream metric math is unchanged — only
    the generation is partitioned."""
    n_member = getattr(args, "member_mesh", 0) or 0
    if n_member <= 1:
        return None
    import jax

    from probunet_tpu.data.transforms import invert_physical_transform
    from probunet_tpu.parallel import (
        make_member_mesh, make_parallel_sample_step,
    )

    n_data = max(len(jax.devices()) // n_member, 1)
    if args.batch_size % n_data:
        raise SystemExit(
            f"--member-mesh {n_member}: --batch-size {args.batch_size} must "
            f"be a multiple of the data-axis size {n_data} "
            f"(= devices // member) or GSPMD cannot partition the batch"
        )
    mesh = make_member_mesh(n_member=n_member)
    gen = make_parallel_sample_step(model, cfg, mesh,
                                    num_samples=args.members, quant=quant)

    @jax.jit
    def sample_hr(hr_batch, key):
        hr_pred = gen(params, hr_batch, key, stats)
        gt = hr_batch
        if cfg.data.transfo:
            hr_pred = invert_physical_transform(hr_pred, cfg.data.variables)
            gt = invert_physical_transform(gt, cfg.data.variables)
        return hr_pred, gt

    return sample_hr


def cmd_evaluate(args):
    """Ensemble test-set evaluation: CRPS / MAE / spread / PSD
    (reference src/metrics.py + results.ipynb cell 12-14).

    STREAMING: every metric is reduced on device per batch
    (evals/streaming.py) and only (B, C) / (k, C) partials cross the
    host link — the (T, M, H, W, C) ensemble is never materialized
    (the reference holds it all in host RAM; at the real 3,650-day x
    M=16 scale that is ~11.5 GB over a ~1000x-slow remote link)."""
    import jax
    import jax.numpy as jnp

    from probunet_tpu.data.loader import Batches
    from probunet_tpu.evals import EvalAccumulator
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.train.checkpoint import CheckpointManager

    timer = _PhaseTimer()
    cfg = build_config(args)
    _, _, ds_test = make_datasets(cfg, splits=(2,))
    timer.mark("dataset")
    model = make_model(cfg)
    res = cfg.data.resolution
    x = jnp.zeros((1, res[0], res[1], cfg.model.input_channels))
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, x, x
    )["params"]
    if args.ckpt:
        params = CheckpointManager(os.path.abspath(args.ckpt)).restore_best(params)
    timer.mark("init")

    stats = jax.tree.map(jnp.asarray, ds_test.stats)
    m = args.members

    n_items = min(len(ds_test), args.max_items or len(ds_test))
    variables = _serve_variables(args, cfg, model, params, ds_test,
                                 n_items, args.batch_size)
    timer.mark("calib")
    sample_hr = _member_mesh_sampler(args, cfg, model, params, stats,
                                     quant=variables.get("quant"))

    @jax.jit
    def sample_hr_single(hr_batch, key):
        batch = ds_test.preprocess(hr_batch)
        out = model.apply(variables, batch["inputs"], num_samples=m,
                          method=ProbabilisticUNet.sample,
                          rngs={"latent": key})  # (B, M, H, W, K)
        from probunet_tpu.data.climex import lrinterp_from_batch, residual_to_hr
        lrinterp = lrinterp_from_batch(batch, cfg.data.lowres_scale,
                                       cfg.data.interp_mode)
        ist = batch.get("stand_stats")
        if ist is not None:  # add the member axis for (B, M, H, W, C) outputs
            ist = jax.tree.map(lambda a: a[:, None], ist)
        hr_pred = residual_to_hr(out, lrinterp[:, None], stats,
                                 ds_test.pipeline, cfg.data.epsilon,
                                 cfg.data.standardization, ist)
        gt = batch["hr"]
        if cfg.data.transfo:
            # metrics are reported in REAL units, inverting the softplus
            # storage transforms (reference results.ipynb cell 2
            # invert_transfo_3vars before metrics.py CRPS/MAE)
            from probunet_tpu.data.transforms import invert_physical_transform
            hr_pred = invert_physical_transform(hr_pred, cfg.data.variables)
            gt = invert_physical_transform(gt, cfg.data.variables)
        return hr_pred, gt

    if sample_hr is None:
        sample_hr = sample_hr_single

    acc = EvalAccumulator()
    key = jax.random.key(0)
    for i, idx in enumerate(Batches(n_items, args.batch_size)):
        e, g = sample_hr(jnp.asarray(ds_test.get_hr_batch(idx)),
                         jax.random.fold_in(key, i))
        acc.update(e, g)  # device-side reductions; (B, C) rows to host
    timer.mark("metric_loop")
    if args.outdir:
        # second pass for the pooled-pixel histogram figure: its shared bin
        # range is only known after the full metric pass. fold_in(key, i)
        # regenerates bit-identical ensembles, so the two-pass histogram
        # equals the materialized one exactly.
        for i, idx in enumerate(Batches(n_items, args.batch_size)):
            e, g = sample_hr(jnp.asarray(ds_test.get_hr_batch(idx)),
                             jax.random.fold_in(key, i))
            acc.update_hist(e, g)
        timer.mark("hist_loop")
    res = acc.result()

    out = {
        "members": m,
        "items": res["items"],
        "crps_mean": res["crps"]["mean"].tolist(),
        "crps_std": res["crps"]["std"].tolist(),
        "mae_mean": res["mae"]["mean"].tolist(),
        "spread": res["spread"].tolist(),
    }
    print(json.dumps(out))
    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)
        with open(os.path.join(args.outdir, "eval.json"), "w") as f:
            json.dump(out, f, indent=2)
        from probunet_tpu.utils.plotting import plot_histograms, plot_psd
        plot_psd({"gt": res["psd_gt"], "model": res["psd_model"]},
                 variables=cfg.data.variables,
                 save_path=os.path.join(args.outdir, "psd.png"))
        # distribution-fidelity figure: pooled pixel-value log-histograms of
        # GT vs the model ensemble (results.ipynb cell 15), streamed counts
        hist = {
            var: {"bins": res["hist"]["centers"][ci],
                  "gt": res["hist"]["gt_log"][ci],
                  "model": res["hist"]["model_log"][ci]}
            for ci, var in enumerate(cfg.data.variables)
        }
        plot_histograms(hist,
                        save_path=os.path.join(args.outdir, "histograms.png"))
        timer.mark("figures")
    timer.report()


def cmd_infer_domain(args):
    """Full-domain tiled ensemble inference (BASELINE config 5; the
    reference only ever processes one fixed 128x128 window —
    SURVEY.md §2.5 P4). The domain is decomposed into pooling-aligned
    overlap tiles, every (day, tile) pair rides the device batch, per-pixel
    statistics are sliced per tile from the global stats artifact, and the
    per-tile HR ensembles are stitched with cosine-ramp blending."""
    import jax
    import jax.numpy as jnp

    from probunet_tpu.data.climex import (
        Standardization, lrinterp_from_batch, preprocess_batch, residual_to_hr,
    )
    from probunet_tpu.evals import compute_mae, crps_over_groundtruth
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.parallel.spatial import extract_tiles, stitch_tiles
    from probunet_tpu.train.checkpoint import CheckpointManager

    cfg = build_config(args)
    k = cfg.data.lowres_scale
    tile = cfg.data.resolution[0]
    dom = args.domain
    os.makedirs(args.outdir, exist_ok=True)

    # full-domain dataset (synthetic unless datadir given)
    from probunet_tpu.data.climex import ClimexDataset
    # the dataset edge-pads the domain to a pooling multiple (ClimEx 280 is
    # not divisible by scale 16); inference runs on the padded grid and the
    # stitched result is cropped back to `dom`
    ds = ClimexDataset(
        datadir=cfg.data.datadir or None,
        years=range(*cfg.data.years_test),
        variables=cfg.data.variables,
        coords=(0, dom, 0, dom),
        pipeline=cfg.data.pipeline,
        lowres_scale=k,
        transfo=cfg.data.transfo,
        interp_mode=cfg.data.interp_mode,
        synthetic=cfg.data.synthetic or not cfg.data.datadir,
        pad_to_multiple=True,
    )
    days = min(args.days, len(ds))
    hr_days = jnp.asarray(ds.get_hr_batch(np.arange(days)))
    dom_pad = hr_days.shape[1]
    gt_days = np.asarray(hr_days[:, :dom, :dom])  # unpadded grid for metrics

    model = make_model(cfg)
    res = cfg.data.resolution
    x = jnp.zeros((1, res[0], res[1], cfg.model.input_channels))
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, x, x
    )["params"]
    if args.ckpt:
        params = CheckpointManager(os.path.abspath(args.ckpt)).restore_best(params)

    # data-parallel tile batches (BASELINE config 5: DP over v5e-8): the
    # (day, tile) batch is sharded over the mesh's "data" axis, params and
    # the rng replicated — GSPMD runs each chunk embarrassingly parallel
    mesh = None
    n_data = 1
    if args.dp:
        from probunet_tpu.parallel.mesh import (
            batch_sharding, make_mesh, replicated,
        )
        n_data = len(jax.devices()) if args.dp == -1 else args.dp
        mesh = make_mesh(n_data=n_data)
        params = jax.device_put(params, replicated(mesh))
        print(f"tile batches data-parallel over {dict(mesh.shape)}")

    # pooling-aligned tiles + per-tile slices of the global stats
    tiles, positions = extract_tiles(hr_days, tile, args.overlap, align=k)
    ntiles = len(positions)
    g = jax.tree.map(jnp.asarray, ds.stats)

    def stat_tiles(arr, scale):
        s = jnp.stack([
            arr[y // scale:(y + tile) // scale, x0 // scale:(x0 + tile) // scale]
            for (y, x0) in positions
        ])
        return jnp.tile(s, (days, 1, 1, 1))  # day-major tile order

    stats_t = Standardization(
        lr_mean=stat_tiles(g.lr_mean, k), lr_std=stat_tiles(g.lr_std, k),
        hr_mean=stat_tiles(g.hr_mean, 1), hr_std=stat_tiles(g.hr_std, 1),
        lr_min=stat_tiles(g.lr_min, k), lr_max=stat_tiles(g.lr_max, k),
        hr_min=stat_tiles(g.hr_min, 1), hr_max=stat_tiles(g.hr_max, 1),
    )

    m_members = args.members

    # --quant int8: calibrate on the first tile chunks (the model serves at
    # TILE resolution here, so scales must be measured on tile-shaped
    # inputs; unlike evaluate/extremes there is no held-out tile source, so
    # the first chunks of the inference domain stand in — absmax PTQ only
    # needs representative dynamic ranges, not unseen data)
    variables = {"params": params}
    if getattr(args, "quant", "none") == "int8":
        from probunet_tpu.ops.quantize import calibrate_sample

        prep = jax.jit(lambda hr_t, st: preprocess_batch(
            hr_t, st, cfg.data.pipeline, k, cfg.data.interp_mode,
            cfg.data.epsilon, cfg.data.standardization)["inputs"])
        cbs = args.batch_tiles
        n_calib = min(max(1, args.calib_batches) * cbs, tiles.shape[0])
        inputs = [
            prep(tiles[i:i + cbs],
                 jax.tree.map(lambda a, i=i: a[i:i + cbs]
                              if a is not None else a, stats_t))
            for i in range(0, n_calib, cbs)
        ]
        scales = calibrate_sample(model, params, inputs,
                                  num_samples=m_members,
                                  key=jax.random.key(cfg.train.seed))
        if getattr(args, "quant_skip", None):
            from probunet_tpu.ops.quantize import quant_skip
            n0 = len(jax.tree.leaves(scales))
            scales = quant_skip(scales, args.quant_skip)
            print(f"int8 serve: --quant-skip {args.quant_skip} pruned "
                  f"{n0 - len(jax.tree.leaves(scales))} of {n0} scales")
        print(f"int8 serve: calibrated {len(jax.tree.leaves(scales))} conv "
              f"scales on {len(inputs)} tile chunks")
        variables = {"params": params, "quant": scales}

    @jax.jit
    def sample_tiles(hr_t, st, key):
        batch = preprocess_batch(hr_t, st, cfg.data.pipeline, k,
                                 cfg.data.interp_mode, cfg.data.epsilon,
                                 cfg.data.standardization)
        out = model.apply(variables, batch["inputs"],
                          num_samples=m_members,
                          method=ProbabilisticUNet.sample,
                          rngs={"latent": key})
        st_b = jax.tree.map(
            lambda a: a[:, None] if a is not None else a, st
        )
        lrinterp = lrinterp_from_batch(batch, k, cfg.data.interp_mode)
        ist = batch.get("stand_stats")
        if ist is not None:  # member axis for (B, M, H, W, C) outputs
            ist = jax.tree.map(lambda a: a[:, None], ist)
        return residual_to_hr(out, lrinterp[:, None], st_b,
                              cfg.data.pipeline, cfg.data.epsilon,
                              cfg.data.standardization, ist)

    bs = args.batch_tiles
    if mesh is not None and bs % n_data:
        bs = -(-bs // n_data) * n_data  # chunk size divisible by the mesh
    outs = []
    key = jax.random.key(cfg.train.seed)
    for i in range(0, tiles.shape[0], bs):
        chunk = tiles[i:i + bs]
        st_chunk = jax.tree.map(
            lambda a: a[i:i + bs] if a is not None else a, stats_t
        )
        n_real = chunk.shape[0]
        if mesh is not None:
            pad = (-n_real) % n_data
            if pad:  # wrap-repeat tiles so every device has work (the
                # last chunk can be smaller than the pad itself)
                idx = jnp.arange(n_real + pad) % n_real
                chunk = chunk[idx]
                st_chunk = jax.tree.map(
                    lambda a: a[idx] if a is not None else a, st_chunk
                )
            sh = batch_sharding(mesh, spatial=False)
            chunk = jax.device_put(chunk, sh)
            st_chunk = jax.tree.map(
                lambda a: jax.device_put(a, sh) if a is not None else a,
                st_chunk,
            )
        outs.append(np.asarray(sample_tiles(
            chunk, st_chunk, jax.random.fold_in(key, i)
        ))[:n_real])
    out = jnp.asarray(np.concatenate(outs))      # (T*ntiles, M, tile, tile, C)

    full = stitch_tiles(out, positions, (dom_pad, dom_pad))
    full = full[:, :, :dom, :dom]                # (T, M, H, W, C) crop padding
    gt = jnp.asarray(gt_days)
    if cfg.data.transfo:
        from probunet_tpu.data.transforms import invert_physical_transform
        full = invert_physical_transform(full, cfg.data.variables)
        gt = invert_physical_transform(gt, cfg.data.variables)

    crps = crps_over_groundtruth(full, gt)
    mae = compute_mae(full, gt)
    result = {
        "domain": dom, "days": days, "tiles_per_day": ntiles,
        "members": m_members,
        "crps_mean": np.asarray(crps["mean"]).tolist(),
        "mae_mean": np.asarray(mae["mean"]).tolist(),
    }
    print(json.dumps(result))
    with open(os.path.join(args.outdir, "infer_domain.json"), "w") as f:
        json.dump(result, f, indent=2)
    try:
        from probunet_tpu.utils.plotting import plot_sample_batch
        plot_sample_batch(np.asarray(full[:1, :3]), np.asarray(gt[:1]),
                          variables=cfg.data.variables,
                          save_path=os.path.join(args.outdir, "domain.png"))
    except Exception as e:
        print(f"plotting skipped: {e}")


def cmd_extremes(args):
    """Observed-vs-model return-level comparison, end to end: trained ckpt
    -> batched daily per-pixel ensembles over the test years -> annual block
    maxima -> GEV fit + parametric bootstrap CI -> observed-vs-model curves
    + JSON (the deliverable of reference test_return_levels.ipynb cells 2-15
    and compare_observed_vs_model_return_levels.ipynb cells 7-21).

    The reference's hot loop is 10,950 x M batch-size-1 forwards
    (SURVEY.md §3.5); here every day rides the device batch and the M
    members are decoded by one vmapped fcomb pass per batch; only the
    requested pixel values return to host.
    """
    import jax
    import jax.numpy as jnp

    from probunet_tpu.data.climex import lrinterp_from_batch, residual_to_hr
    from probunet_tpu.data.loader import Batches
    from probunet_tpu.evals import model_ensemble_analysis, return_level_analysis
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.train.checkpoint import CheckpointManager

    timer = _PhaseTimer()
    cfg = build_config(args)
    os.makedirs(args.outdir, exist_ok=True)
    _, _, ds_test = make_datasets(cfg, splits=(2,))
    timer.mark("dataset")
    model = make_model(cfg)
    res = cfg.data.resolution
    x = jnp.zeros((1, res[0], res[1], cfg.model.input_channels))
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, x, x
    )["params"]
    if args.ckpt:
        params = CheckpointManager(os.path.abspath(args.ckpt)).restore_best(params)
    timer.mark("init")

    pixels = [tuple(int(v) for v in p.split(",")) for p in args.pixels]
    var_idx = list(cfg.data.variables).index(args.var)
    ys = jnp.asarray([p[0] for p in pixels])
    xs = jnp.asarray([p[1] for p in pixels])
    stats = jax.tree.map(jnp.asarray, ds_test.stats)
    m = args.members

    days = len(ds_test) if not args.days else min(args.days, len(ds_test))
    variables = _serve_variables(args, cfg, model, params, ds_test,
                                 days, args.batch_size)
    timer.mark("calib")

    # the member axis of the (30-year x M) sweep sharded over a
    # ("data", "member") mesh — the multi-chip form of the reference's
    # 10,950 x M serial loop (SURVEY.md §3.5)
    member_sampler = _member_mesh_sampler(args, cfg, model, params, stats,
                                          quant=variables.get("quant"))
    sample_pixels = None
    if member_sampler is not None:

        @jax.jit
        def sample_pixels(hr_batch, key):
            hr_pred, gt = member_sampler(hr_batch, key)
            return hr_pred[:, :, ys, xs, var_idx], gt[:, ys, xs, var_idx]

    @jax.jit
    def sample_pixels_single(hr_batch, key):
        batch = ds_test.preprocess(hr_batch)
        out = model.apply(variables, batch["inputs"], num_samples=m,
                          method=ProbabilisticUNet.sample,
                          rngs={"latent": key})  # (B, M, H, W, C)
        lrinterp = lrinterp_from_batch(batch, cfg.data.lowres_scale,
                                       cfg.data.interp_mode)
        ist = batch.get("stand_stats")
        if ist is not None:
            ist = jax.tree.map(lambda a: a[:, None], ist)
        hr_pred = residual_to_hr(out, lrinterp[:, None], stats,
                                 ds_test.pipeline, cfg.data.epsilon,
                                 cfg.data.standardization, ist)
        gt = batch["hr"]
        if cfg.data.transfo:
            # extremes are physical-units statements (mm/day); invert the
            # softplus storage transforms before extracting pixels
            from probunet_tpu.data.transforms import invert_physical_transform
            hr_pred = invert_physical_transform(hr_pred, cfg.data.variables)
            gt = invert_physical_transform(gt, cfg.data.variables)
        return hr_pred[:, :, ys, xs, var_idx], gt[:, ys, xs, var_idx]

    if sample_pixels is None:
        sample_pixels = sample_pixels_single

    model_vals, gt_vals = [], []
    key = jax.random.key(cfg.train.seed)
    for i, idx in enumerate(Batches(days, args.batch_size)):
        mv, gv = sample_pixels(jnp.asarray(ds_test.get_hr_batch(idx)),
                               jax.random.fold_in(key, i))
        model_vals.append(np.asarray(mv))
        gt_vals.append(np.asarray(gv))
    model_series = np.concatenate(model_vals)  # (T, M, P)
    gt_series = np.concatenate(gt_vals)        # (T, P)
    timer.mark("sample_loop")

    periods = tuple(args.return_periods)
    results = {}
    for pi, (py, px) in enumerate(pixels):
        obs = return_level_analysis(
            gt_series[:, pi], periods, args.days_per_year,
            n_boot=args.n_boot, seed=cfg.train.seed,
        )
        mod = model_ensemble_analysis(
            model_series[:, :, pi], periods, args.days_per_year,
            n_boot=args.n_boot, seed=cfg.train.seed,
        )
        name = f"pixel_{py}_{px}"
        results[name] = {
            "pixel": [py, px],
            "observed": {
                "gev_fit": list(obs["fit"]),
                "return_levels": obs["return_levels"].tolist(),
                "ci_lower": obs["bootstrap"]["lower"].tolist(),
                "ci_upper": obs["bootstrap"]["upper"].tolist(),
                "bootstrap_valid": obs["bootstrap"]["n_valid"],
                "bootstrap_failed": obs["bootstrap"]["n_failed"],
                # raw annual maxima (n_years floats): lets fit
                # instability be diagnosed/refit host-side without
                # re-running the 10,950-day sampling loop
                "block_maxima": obs["block_maxima"].tolist(),
            },
            "model": {
                "gev_fit": list(mod["fit"]),
                "return_levels": mod["return_levels"].tolist(),
                "ci_lower": mod["bootstrap"]["lower"].tolist(),
                "ci_upper": mod["bootstrap"]["upper"].tolist(),
                "bootstrap_valid": mod["bootstrap"]["n_valid"],
                "bootstrap_failed": mod["bootstrap"]["n_failed"],
                # the reference's known-deficiency diagnostic: where the
                # model's empirical maxima top out (plateau ~75 mm/day in
                # test_return_levels.ipynb cell 10)
                "empirical_plateau": float(mod["empirical_levels"].max()),
                # (n_years, M) per-member annual maxima, pooled for the fit
                "block_maxima": mod["block_maxima"].tolist(),
            },
        }
        try:
            from probunet_tpu.utils.plotting import plot_return_levels
            plot_return_levels(
                mod, observed_analysis=obs, label="model",
                save_path=os.path.join(args.outdir,
                                       f"return_levels_{name}.png"),
            )
        except Exception as e:
            print(f"plotting skipped for {name}: {e}")

    timer.mark("gev_fits")
    # report PROCESSED days: Batches drops the ragged tail batch for a
    # static device shape (data/loader.py drop_last), so e.g. a 10,950-day
    # split at bs=128 serves 85 x 128 = 10,880 days -> 29 annual maxima
    out = {"variable": args.var, "members": m,
           "days": int(model_series.shape[0]),
           "days_requested": int(days),
           "days_per_year": args.days_per_year,
           "return_periods": list(periods), "pixels": results}
    with open(os.path.join(args.outdir, "extremes.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    timer.report()


def cmd_pack(args):
    """One-time NetCDF -> packed-array conversion (SURVEY.md §7 row 1): the
    training loop then memory-maps the artifact instead of re-running the
    reference's per-item ingest every epoch."""
    from probunet_tpu.data.climex import save_packed

    cfg = build_config(args)
    years = {"train": cfg.data.years_train, "val": cfg.data.years_val,
             "test": cfg.data.years_test}[args.split]
    from probunet_tpu.data.climex import ClimexDataset
    ds = ClimexDataset(
        datadir=cfg.data.datadir or None,
        years=range(*years),
        variables=cfg.data.variables,
        coords=cfg.data.coords,
        pipeline=cfg.data.pipeline,
        lowres_scale=cfg.data.lowres_scale,
        transfo=False,  # pack RAW physical fields; transforms apply at load
        megafile=cfg.data.megafile,
        synthetic=cfg.data.synthetic,
    )
    save_packed(args.out, ds.hr, ds.timestamps, ds.timestamps_float)
    print(json.dumps({"packed": args.out, "shape": list(ds.hr.shape)}))


def cmd_sweep(args):
    """Hyperparameter grid sweep (reference sweeps.yaml:1-14 semantics —
    wandb grid over dotted config keys, ranked by final val loss). The spec
    is a JSON file {"dotted.key": [values...]} or inline --grid pairs
    key=v1,v2,..."""
    from probunet_tpu.sweep import run_sweep

    cfg = build_config(args)
    if args.spec:
        with open(args.spec) as f:
            if args.spec.endswith((".yaml", ".yml")):
                # reference-style sweep file (sweeps.yaml); accept both the
                # plain {key: [values]} form and wandb's
                # {parameters: {key: {values: [...]}}} schema
                import yaml
                raw = yaml.safe_load(f)
                if "parameters" in raw:
                    # the reference's flat argparse names -> dotted keys
                    aliases = {"batch_size": "train.batch_size",
                               "lr": "train.lr",
                               "num_epochs": "train.num_epochs",
                               "ensemble_size": "train.ensemble_size",
                               "latent_dim": "model.latent_dim"}
                    spec = {aliases.get(k, k): v["values"]
                            for k, v in raw["parameters"].items()}
                else:
                    spec = raw
            else:
                spec = json.load(f)
    else:
        spec = {}
        for pair in args.grid or []:
            key, _, vals = pair.partition("=")
            spec[key] = [json.loads(v) if _is_json(v) else v
                         for v in vals.split(",")]
    if not spec:
        raise SystemExit("sweep needs --spec FILE or --grid key=v1,v2,...")

    results = run_sweep(cfg, spec, metric=args.metric,
                        num_epochs=args.epochs or None)
    os.makedirs(args.outdir, exist_ok=True)
    summary = [{"overrides": r["overrides"], args.metric: r[args.metric]}
               for r in results]
    with open(os.path.join(args.outdir, "sweep.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({"best": summary[0], "points": len(summary)}))


def _is_json(s: str) -> bool:
    try:
        json.loads(s)
        return True
    except json.JSONDecodeError:
        return False


def cmd_bench(args):
    import bench
    bench.main()


def main(argv=None):
    # PROBUNET_PLATFORM=cpu|tpu overrides the JAX backend via the config API
    # (effective even where site configuration pre-registers a backend and
    # the JAX_PLATFORMS env var alone is ignored)
    plat = os.environ.get("PROBUNET_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    p = argparse.ArgumentParser(prog="probunet_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--preset", choices=PRESETS, default=None)
        sp.add_argument("--config", default=None, help="config JSON path")
        sp.add_argument("--set", nargs="*", default=[],
                        help="dotted overrides key=value")
        sp.add_argument("--outdir", default="results")

    def _quant_flags(sp):
        sp.add_argument("--quant", choices=("none", "int8"), default="none",
                        help="serve the ensemble with int8 convs "
                             "(ops/quantize.py PTQ; +43%% measured on the "
                             "bandwidth-bound serve path)")
        sp.add_argument("--calib-batches", type=int, default=4,
                        help="serve batches the int8 calibration pass sees")
        sp.add_argument("--quant-skip", nargs="*", default=None,
                        help="regexes of conv module paths to KEEP in float "
                             "under --quant int8 (mixed-precision PTQ); "
                             "alias 'heads' = the prior/posterior "
                             "conv_mu/conv_log_sigma distribution heads "
                             "(ops/quantize.py SKIP_ALIASES)")

    sp = sub.add_parser("train", help="probabilistic U-Net ELBO training")
    common(sp)
    sp.add_argument("--wandb", action="store_true")
    sp.add_argument("--resume", action="store_true",
                    help="resume full train state from the latest checkpoint")
    sp.add_argument("--plot-every", type=int, default=0,
                    help="save ensemble/residual figures every N epochs "
                         "(0 = off; the reference plots every epoch)")
    sp.add_argument("--dp", type=int, default=0,
                    help="data-parallel over N devices (-1 = all, 0 = off)")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("train-det", help="deterministic baselines")
    common(sp)
    sp.add_argument("--model", default="unet",
                    choices=("unet", "linearcnn", "bcsd"))
    sp.set_defaults(fn=cmd_train_det)

    sp = sub.add_parser("explore", help="latent exploration")
    common(sp)
    sp.add_argument("--ckpt", default=None)
    sp.add_argument("--posterior", action="store_true")
    sp.add_argument("--single", action="store_true")
    sp.add_argument("--max-items", type=int, default=512)
    sp.add_argument("--probe-contexts", type=int, default=32,
                    help="items the collapse probes 5-10 aggregate over "
                         "(1 = single-context fast path)")
    sp.set_defaults(fn=cmd_explore)

    sp = sub.add_parser("evaluate", help="ensemble CRPS/MAE/PSD eval")
    common(sp)
    sp.add_argument("--ckpt", default=None)
    sp.add_argument("--members", type=int, default=16)
    sp.add_argument("--batch-size", type=int, default=16)
    sp.add_argument("--max-items", type=int, default=None)
    sp.add_argument("--member-mesh", type=int, default=0, metavar="N",
                    help="shard the ensemble over a ('data','member') mesh "
                         "with N-way member parallelism (needs >= N devices)")
    _quant_flags(sp)
    sp.set_defaults(fn=cmd_evaluate)

    sp = sub.add_parser("infer-domain",
                        help="full-domain tiled ensemble inference")
    common(sp)
    sp.add_argument("--ckpt", default=None)
    sp.add_argument("--domain", type=int, default=280)
    sp.add_argument("--days", type=int, default=4)
    sp.add_argument("--members", type=int, default=8)
    sp.add_argument("--overlap", type=int, default=16)
    sp.add_argument("--batch-tiles", type=int, default=16)
    sp.add_argument("--dp", type=int, default=0,
                    help="shard tile batches over N devices (-1 = all)")
    _quant_flags(sp)
    sp.set_defaults(fn=cmd_infer_domain)

    sp = sub.add_parser("extremes",
                        help="observed-vs-model GEV return-level comparison")
    common(sp)
    sp.add_argument("--ckpt", default=None)
    sp.add_argument("--var", default="pr")
    sp.add_argument("--pixels", nargs="+", default=["20,45"],
                    help="pixel coords y,x (repeatable)")
    sp.add_argument("--members", type=int, default=8)
    sp.add_argument("--batch-size", type=int, default=32)
    sp.add_argument("--days", type=int, default=0,
                    help="limit test days (0 = all test years)")
    sp.add_argument("--days-per-year", type=int, default=365)
    sp.add_argument("--n-boot", type=int, default=1000)
    sp.add_argument("--return-periods", type=int, nargs="+",
                    default=[2, 5, 10, 20, 50, 100])
    sp.add_argument("--member-mesh", type=int, default=0, metavar="N",
                    help="shard the ensemble over a ('data','member') mesh "
                         "with N-way member parallelism (needs >= N devices)")
    _quant_flags(sp)
    sp.set_defaults(fn=cmd_extremes)

    sp = sub.add_parser("pack", help="NetCDF -> packed-array conversion")
    common(sp)
    sp.add_argument("--split", choices=("train", "val", "test"),
                    default="train")
    sp.add_argument("--out", required=True, help="output .npz path")
    sp.set_defaults(fn=cmd_pack)

    sp = sub.add_parser("sweep", help="hyperparameter grid sweep")
    common(sp)
    sp.add_argument("--spec", default=None,
                    help="JSON {dotted.key: [values...]} or a wandb-style "
                         "sweeps.yaml (reference sweeps.yaml:1-14 schema)")
    sp.add_argument("--grid", nargs="*", default=[],
                    help="inline grid key=v1,v2,...")
    sp.add_argument("--metric", default="val_crps")
    sp.add_argument("--epochs", type=int, default=0,
                    help="override epochs per sweep point (0 = config value)")
    sp.set_defaults(fn=cmd_sweep)

    sp = sub.add_parser("bench", help="headline benchmark")
    sp.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
