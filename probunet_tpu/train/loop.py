"""Jitted training/eval steps and the epoch orchestrator.

TPU-native redesign of the reference training loops
(reference src/train_prob_unet_model.py:105-210 and src/main.py:120-203):

- ONE ``jax.jit``-compiled update containing device-side batch preprocessing
  (pool/interp/standardize/residual), the M-sample vmapped ELBO, the backward
  pass and the AdamW update — the reference interleaves host-side dataset
  work, M Python-loop forward passes and eager optimizer steps;
- beta_0/beta_1 enter as traced scalars, so the annealing schedule
  (src/main.py:141-155) changes no compilation;
- per-step PRNG is fold_in(state.rng, state.step): deterministic, resumable,
  no global seeding (replaces src/main.py:15-26);
- donated state buffers (in-place update in HBM).

With a :class:`~jax.sharding.Mesh` from ``probunet_tpu.parallel``, the same
step runs data-parallel: the batch is sharded over the mesh's "data" axis and
XLA inserts the gradient all-reduce (psum) automatically.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.config import Config
from probunet_tpu.data.climex import Standardization, preprocess_batch
from probunet_tpu.data.loader import Batches, prefetch_to_device
from probunet_tpu.models.prob_unet import ProbabilisticUNet
from probunet_tpu.train.early_stop import EarlyStopper
from probunet_tpu.train.schedule import beta_schedule
from probunet_tpu.train.state import TrainState, create_train_state
from probunet_tpu.utils.compile_opts import tuned_compiler_options


def make_elbo_loss_fn(
    model: ProbabilisticUNet, cfg: Config, training: bool = True,
    quant=None, collect_stats: bool = False,
) -> Callable:
    """Pure ELBO loss function of (params, rng, hr_batch, stats, b0, b1).

    Shared by the single-chip step (:func:`make_train_step`) and the
    mesh-sharded step (``probunet_tpu.parallel.data_parallel``).
    With ``training=False`` uses eval_ensemble_size and disables dropout.

    ``quant``: a "quant" variable collection (ops/quantize.py) — the convs
    that find their calibrated scale serve int8 (eval/no-grad use only; the
    int8 conv has no vjp rule on purpose). ``collect_stats``: run with the
    "quant_stats" collection mutable and return the sown per-conv input
    absmax tree in ``metrics["quant_stats"]`` — the calibration pass for
    this exact path.
    """
    loss_cfg = cfg.loss
    data_cfg = cfg.data
    m_size = cfg.train.ensemble_size if training else cfg.train.eval_ensemble_size

    def loss_fn(params, rng, hr_batch, stats, beta_0, beta_1):
        batch = preprocess_batch(
            hr_batch, stats, data_cfg.pipeline, data_cfg.lowres_scale,
            data_cfg.interp_mode, data_cfg.epsilon, data_cfg.standardization,
        )
        latent_rng, dropout_rng = jax.random.split(rng)
        variables = {"params": params}
        if quant is not None:
            variables["quant"] = quant
        out = model.apply(
            variables,
            batch["inputs"],
            batch["targets"],
            M=m_size,
            loss_type=loss_cfg.loss_type,
            beta_0=beta_0,
            beta_1=beta_1,
            beta_2=loss_cfg.beta_2,
            alpha=loss_cfg.alpha,
            alpha_w=loss_cfg.alpha_w,
            beta_w=loss_cfg.beta_w,
            lam_w=loss_cfg.lam_w,
            training=training,
            method=ProbabilisticUNet.elbo,
            rngs={"latent": latent_rng, "dropout": dropout_rng},
            mutable=["quant_stats"] if collect_stats else False,
        )
        if collect_stats:
            (total, metrics), vs = out
            metrics = dict(metrics)
            metrics["quant_stats"] = vs.get("quant_stats", {})
        else:
            total, metrics = out
        return total, metrics

    return loss_fn


def make_train_step(
    model: ProbabilisticUNet,
    cfg: Config,
    donate: bool = True,
) -> Callable:
    """Build the jitted ELBO train step.

    step(state, hr_batch, stats, beta_0, beta_1) -> (state, metrics)

    hr_batch is the RAW high-resolution window (B, H, W, C) in storage space;
    all derived quantities are computed on device (see data.climex).
    """
    loss_fn = make_elbo_loss_fn(model, cfg)

    @partial(jax.jit, donate_argnums=(0,) if donate else (),
             compiler_options=tuned_compiler_options())
    def step(state: TrainState, hr_batch, stats: Standardization, beta_0, beta_1):
        rng = jax.random.fold_in(state.rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, rng, hr_batch, stats, beta_0, beta_1
        )
        new_state = state.apply_gradients(grads=grads)
        out = {
            "loss": loss,
            "recon": metrics["recon"],
            "kl_mean": metrics["kl_mean"],
            "grad_norm": optax_global_norm(grads),
        }
        return new_state, out

    return step


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.vdot(x, x).real for x in leaves))


def make_eval_step(model: ProbabilisticUNet, cfg: Config, quant=None) -> Callable:
    """Jitted no-grad ELBO evaluation
    (reference src/train_prob_unet_model.py:161-210). Uses the posterior like
    the reference eval (elbo with targets), M = eval_ensemble_size. Shares
    the exact loss/rng wiring of the mesh-parallel eval step so single- and
    multi-device evaluation produce identical values.

    ``quant``: optional calibrated "quant" collection
    (:func:`probunet_tpu.ops.quantize.calibrate_elbo`) — serves the
    no-grad ELBO with int8 convs."""
    eval_loss_fn = make_elbo_loss_fn(model, cfg, training=False, quant=quant)

    @partial(jax.jit, compiler_options=tuned_compiler_options())
    def step(params, rng, hr_batch, stats: Standardization):
        total, metrics = eval_loss_fn(
            params, rng, hr_batch, stats, jnp.float32(1.0), jnp.float32(0.0)
        )
        return {"recon": metrics["recon"], "kl_mean": metrics["kl_mean"],
                "loss": total}

    return step


def make_deterministic_train_step(model, cfg: Config, donate: bool = True):
    """MSE train step for the deterministic baselines (UNet/LinearCNN),
    with per-variable loss logging (reference src/trainmodel.py:119-203)."""
    data_cfg = cfg.data

    def loss_fn(params, rng, hr_batch, stats):
        batch = preprocess_batch(
            hr_batch, stats, data_cfg.pipeline, data_cfg.lowres_scale,
            data_cfg.interp_mode, data_cfg.epsilon, data_cfg.standardization,
        )
        pred = model.apply(
            {"params": params}, batch["inputs"], train=True,
            rngs={"dropout": rng},
        )
        err = (pred - batch["targets"]) ** 2
        per_var = err.mean(axis=tuple(range(err.ndim - 1)))  # (C,)
        return per_var.mean(), per_var

    @partial(jax.jit, donate_argnums=(0,) if donate else (),
             compiler_options=tuned_compiler_options())
    def step(state: TrainState, hr_batch, stats: Standardization):
        rng = jax.random.fold_in(state.rng, state.step)
        (loss, per_var), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, rng, hr_batch, stats
        )
        new_state = state.apply_gradients(grads=grads)
        return new_state, {"loss": loss, "loss_per_var": per_var}

    return step


# ---------------------------------------------------------------------------
# Epoch runners
# ---------------------------------------------------------------------------

def train_epoch(
    step_fn,
    state: TrainState,
    dataset,
    stats_dev,
    cfg: Config,
    beta_0: float,
    beta_1: float,
    epoch: int,
    logger=None,
    sharding=None,
    ckpt=None,
) -> tuple[TrainState, dict[str, float]]:
    """One training epoch (reference src/train_prob_unet_model.py:105-158).

    With ``ckpt`` and cfg.train.checkpoint_every > 0, a full-state
    checkpoint is written every N steps (fault tolerance mid-epoch — the
    reference only saves at end of training, SURVEY.md §5)."""
    batches = Batches(
        len(dataset), cfg.train.batch_size, shuffle=True,
        seed=cfg.train.seed + epoch,
    )
    hr_iter = (dataset.get_hr_batch(idx) for idx in batches)
    recon_vals, kl_vals = [], []
    b0 = jnp.asarray(beta_0, jnp.float32)
    b1 = jnp.asarray(beta_1, jnp.float32)
    every = cfg.train.checkpoint_every
    t0 = time.time()
    n = 0
    for hr in prefetch_to_device(hr_iter, sharding=sharding):
        state, metrics = step_fn(state, hr, stats_dev, b0, b1)
        n += 1
        if logger is not None and n % cfg.train.log_every == 0:
            logger.log(
                {k: v for k, v in metrics.items()}, step=int(state.step),
                kind="train",
            )
        if ckpt is not None and every and int(state.step) % every == 0:
            ckpt.save(int(state.step), state, extra={"epoch": epoch})
        recon_vals.append(metrics["recon"])
        kl_vals.append(metrics["kl_mean"])
    # single host sync at epoch end
    mean_recon = float(jnp.mean(jnp.stack(recon_vals)))
    mean_kl = float(jnp.mean(jnp.stack(kl_vals)))
    dt = time.time() - t0
    summary = {
        "recon": mean_recon,
        "kl": mean_kl,
        "steps_per_sec": n / dt,
        "samples_per_sec": n * cfg.train.batch_size / dt,
    }
    return state, summary


def eval_model(
    eval_step_fn,
    state: TrainState,
    dataset,
    stats_dev,
    cfg: Config,
    epoch: int = 0,
    sharding=None,
) -> dict[str, float]:
    """Full-dataset evaluation (reference src/train_prob_unet_model.py:161-210)."""
    batches = Batches(len(dataset), cfg.train.batch_size, shuffle=False)
    hr_iter = (dataset.get_hr_batch(idx) for idx in batches)
    rng = jax.random.fold_in(jax.random.key(cfg.train.seed + 7919), epoch)
    recon_vals, kl_vals = [], []
    for i, hr in enumerate(prefetch_to_device(hr_iter, sharding=sharding)):
        metrics = eval_step_fn(
            state.params, jax.random.fold_in(rng, i), hr, stats_dev
        )
        recon_vals.append(metrics["recon"])
        kl_vals.append(metrics["kl_mean"])
    return {
        "recon": float(jnp.mean(jnp.stack(recon_vals))),
        "kl": float(jnp.mean(jnp.stack(kl_vals))),
    }


class Trainer:
    """Full training orchestration with beta annealing, per-epoch validation,
    early stopping and checkpointing — the src/main.py:107-238 driver as a
    reusable class."""

    def __init__(
        self,
        cfg: Config,
        model: ProbabilisticUNet,
        dataset_train,
        dataset_val=None,
        logger=None,
        checkpoint_manager=None,
        sharding=None,
        state: TrainState | None = None,
        plot_dir: str | None = None,
        plot_every: int = 1,
        mesh=None,
    ):
        self.cfg = cfg
        self.model = model
        self.dataset_train = dataset_train
        self.dataset_val = dataset_val
        self.logger = logger
        self.ckpt = checkpoint_manager
        self.mesh = mesh
        if mesh is not None and sharding is None:
            from probunet_tpu.parallel.mesh import batch_sharding
            sharding = batch_sharding(mesh, spatial=False)
        self.sharding = sharding
        self.plot_dir = plot_dir
        self.plot_every = plot_every

        res = cfg.data.resolution
        example_x = jnp.zeros(
            (cfg.train.batch_size, res[0], res[1], cfg.model.input_channels)
        )
        self.state = state or create_train_state(
            model,
            example_x,
            jnp.zeros((cfg.train.batch_size, res[0], res[1], cfg.model.num_classes)),
            seed=cfg.train.seed,
            lr=cfg.train.lr,
            weight_decay=cfg.train.weight_decay,
            grad_clip=cfg.train.grad_clip,
            accum=cfg.train.accum,
            rng_impl=cfg.train.rng_impl,
        )
        if mesh is not None:
            # data-parallel jitted steps over the mesh (SURVEY.md §2.5 P1);
            # state/stats replicated, batch sharded over "data"
            from probunet_tpu.parallel.data_parallel import (
                make_parallel_eval_step, make_parallel_train_step,
            )
            from probunet_tpu.parallel.mesh import replicated

            self.state = jax.device_put(self.state, replicated(mesh))
            self.train_step = make_parallel_train_step(model, cfg, mesh)
            self.eval_step = make_parallel_eval_step(model, cfg, mesh)
            self.stats_dev = jax.device_put(
                jax.tree.map(jnp.asarray, dataset_train.stats),
                replicated(mesh),
            )
        else:
            self.train_step = make_train_step(model, cfg)
            self.eval_step = make_eval_step(model, cfg)
            self.stats_dev = jax.tree.map(jnp.asarray, dataset_train.stats)
        self.stopper = EarlyStopper(cfg.train.patience, cfg.train.min_delta)
        self.history = {"train_crps": [], "train_kl": [], "val_crps": [], "val_kl": []}

    def fit(self, num_epochs: int | None = None) -> dict:
        cfg = self.cfg
        num_epochs = num_epochs or cfg.train.num_epochs
        for epoch in range(1, num_epochs + 1):
            beta_0, beta_1 = beta_schedule(
                epoch, num_epochs, cfg.loss.warmup_epochs, cfg.loss.max_beta_1
            )
            self.state, train_summary = train_epoch(
                self.train_step, self.state, self.dataset_train, self.stats_dev,
                cfg, beta_0, beta_1, epoch, logger=self.logger,
                sharding=self.sharding, ckpt=self.ckpt,
            )
            self.history["train_crps"].append(train_summary["recon"])
            self.history["train_kl"].append(train_summary["kl"])

            rec = {"epoch": epoch, "beta_0": beta_0, "beta_1": beta_1,
                   **{f"train_{k}": v for k, v in train_summary.items()}}

            if self.dataset_val is not None:
                val_stats = jax.tree.map(jnp.asarray, self.dataset_val.stats)
                val = eval_model(
                    self.eval_step, self.state, self.dataset_val, val_stats,
                    cfg, epoch, sharding=self.sharding,
                )
                self.history["val_crps"].append(val["recon"])
                self.history["val_kl"].append(val["kl"])
                rec.update({f"val_{k}": v for k, v in val.items()})

                stop, params = self.stopper.early_stop(val["recon"], self.state.params)
                if self.ckpt is not None and self.stopper.counter == 0:
                    self.ckpt.save_best(self.state.params)
                if stop:
                    self.state = self.state.replace(params=params)
                    if self.logger:
                        self.logger.log({"early_stop_epoch": epoch}, kind="info")
                    break

            if self.logger:
                self.logger.log(rec, step=int(self.state.step), kind="epoch")
            if self.ckpt is not None:
                self.ckpt.save(
                    int(self.state.step), self.state,
                    extra={"epoch": epoch, "beta_0": beta_0, "beta_1": beta_1},
                )
            if self.plot_dir and epoch % self.plot_every == 0:
                try:
                    self.save_sample_plots(epoch)
                except Exception as e:  # plotting must never kill training
                    if self.logger:
                        self.logger.log({"plot_error": str(e)}, kind="info")
        if self.ckpt is not None:
            self.ckpt.wait()
        return self.history

    # ------------------------------------------------------------------
    def sample_ensemble(self, dataset=None, num_items: int = 3,
                        num_samples: int = 3, seed: int = 0):
        """Prior-ensemble HR fields for a few items:
        (samples (B, M, H, W, C), hr, lrinterp) — the per-epoch sanity
        sampling of reference src/train_prob_unet_model.py:213-305."""
        from probunet_tpu.data.climex import lrinterp_from_batch

        ds = dataset or self.dataset_val or self.dataset_train
        idx = np.arange(num_items)
        batch = ds.preprocess(jnp.asarray(ds.get_hr_batch(idx)))
        out = self.model.apply(
            {"params": self.state.params}, batch["inputs"],
            num_samples=num_samples, method=type(self.model).sample,
            rngs={"latent": jax.random.key(seed)},
        )
        lrinterp = lrinterp_from_batch(batch, ds.lowres_scale, ds.interp_mode)
        ist = batch.get("stand_stats")
        if ist is not None:  # add the member axis for (B, M, H, W, C) outputs
            ist = jax.tree.map(lambda a: a[:, None], ist)
        hr_pred = ds.residual_to_hr(out, lrinterp[:, None], item_stats=ist)
        return hr_pred, batch["hr"], lrinterp, out, batch["targets"]

    def save_sample_plots(self, epoch: int):
        """Per-epoch ensemble / residual-difference figures
        (reference src/main.py:171-203)."""
        import os

        from probunet_tpu.utils.plotting import (
            plot_residual_differences, plot_residual_sample_batch,
            plot_sample_batch,
        )

        hr_pred, hr, lrinterp, resid, resid_tgt = self.sample_ensemble()
        d = self.plot_dir
        variables = self.cfg.data.variables
        # geo-reference panels when the dataset carries NetCDF lat/lon
        # (reference src/climex_utils.py:354-363)
        ds = self.dataset_val or self.dataset_train
        lat = getattr(ds, "lat", None)
        lon = getattr(ds, "lon", None)
        plot_sample_batch(
            np.asarray(hr_pred), np.asarray(hr), np.asarray(lrinterp),
            variables=variables, lat=lat, lon=lon,
            save_path=os.path.join(d, f"samples_ep{epoch:03d}.png"),
        )
        plot_residual_sample_batch(
            np.asarray(resid), np.asarray(resid_tgt), variables=variables,
            lat=lat, lon=lon,
            save_path=os.path.join(d, f"residuals_ep{epoch:03d}.png"),
        )
        plot_residual_differences(
            np.asarray(resid), variables=variables, lat=lat, lon=lon,
            save_path=os.path.join(d, f"residual_diffs_ep{epoch:03d}.png"),
        )
