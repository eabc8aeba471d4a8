"""Quality A/B: train the ACTUAL torch reference vs probunet_tpu, same data.

VERDICT r2 missing #1: all convergence evidence was self-referential. This
script closes the loop by driving the reference's own modules and training
functions (imported from /root/reference/src) on synthetic ClimEx-like
fields, then training this framework on the SAME array with the same
config, and overlaying the per-epoch recon/KL curves.

Reference pieces driven (not re-implemented):
  - ``climex2torch`` dataset semantics via a __new__-constructed instance
    (compute_stats + __getitem__, src/climex_utils.py:152-285);
  - ``ProbabilisticUNet`` (src/prob_unet.py:140) — its committed-notebook
    afCRPS ELBO: the notebook runs used the 3-return afCRPS variant that the
    repo keeps commented at src/prob_unet.py:273-317 while
    ``train_probunet_step`` still calls its signature (SURVEY.md §1 "API
    drift"); a subclass below re-attaches exactly that ELBO, composed only
    of reference components (prior/posterior/fcomb/rsample/kl/afcrps_loss);
  - ``train_probunet_step`` / ``eval_probunet_model``
    (src/train_prob_unet_model.py:105-210);
  - AdamW(lr=1e-4) as src/main.py:103, beta schedule as src/main.py:111-155.

Ours: the probunet_tpu Trainer on a ClimexDataset wrapping the same HR
array, f32, identical tiny config.

Usage: python scripts/reference_ab.py [--epochs 10] [--bs 16] [--side both]
Writes results/reference_ab/{reference,ours}_curves.json + overlay.png.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, ".")

REF = "/root/reference/src"
OUT = "results/reference_ab"

# tiny config (VERDICT r2 next-round item 2)
RES = 64
SCALE = 8
VARS = ("pr", "tasmin", "tasmax")
LATENT = 6
NUM_FILTERS = [16, 32]
MODEL_CHANNELS = 16
CHANNEL_MULT = [1, 2]
M_TRAIN = 5
M_EVAL = 5
LR = 1e-4
WARMUP = 2
MAX_BETA_1 = 1e-3   # the committed notebook anneals beta_1 to ~1e-3
T_TRAIN = 730
T_VAL = 365
SEED = 0


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    import importlib.machinery

    mod = types.ModuleType(name)
    # torch._dynamo.trace_rules walks sys.modules with find_spec(), which
    # raises on modules whose __spec__ is None — give stubs a real spec
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _import_reference():
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub("pytorch_msssim", ms_ssim=lambda *a, **k: torch.tensor(0.25))
    _stub("dask")
    _stub("dask.distributed", Client=object)
    _stub("xarray")
    _stub("bottleneck")
    _stub("cftime")
    crs = _stub("cartopy.crs", PlateCarree=object, RotatedPole=object)
    _stub("cartopy", crs=crs)
    import climex_utils  # type: ignore
    import prob_unet  # type: ignore
    import prob_unet_utils  # type: ignore
    import train_prob_unet_model  # type: ignore

    return climex_utils, prob_unet, prob_unet_utils, train_prob_unet_model


def make_data():
    from probunet_tpu.data.synthetic import synthetic_climex_fields

    hr_train = synthetic_climex_fields(T_TRAIN, RES, RES, VARS, seed=SEED)
    hr_val = synthetic_climex_fields(T_VAL, RES, RES, VARS, seed=SEED + 1)
    return np.asarray(hr_train), np.asarray(hr_val)


def beta_schedule(epoch: int, num_epochs: int):
    """Betas in effect while training `epoch` — src/main.py:111-155
    semantics (betas updated after each epoch; see train/schedule.py)."""
    prev = epoch - 1
    if prev <= WARMUP:
        return 1.0, 0.0
    progress = min((prev - WARMUP) / (num_epochs - WARMUP), 1.0)
    return 1.0, progress * MAX_BETA_1


# ---------------------------------------------------------------------------
# Reference side
# ---------------------------------------------------------------------------

def _uncomment_reference_afcrps_elbo(puu):
    """Re-activate the reference's own commented-out afCRPS ``elbo``
    (src/prob_unet.py:273-317) by stripping the comment markers from its
    source text and exec-ing it against the reference's imports. Returns
    the unbound function. Raises if the block cannot be located (the
    reference tree is read-only, so this is effectively pinned)."""
    import re
    import torch
    from torch.distributions import Independent, Normal, kl

    lines = open(os.path.join(REF, "prob_unet.py")).read().splitlines()
    start = next(
        i for i, l in enumerate(lines)
        if l.lstrip().startswith("# def elbo(") and "alpha" in l
    )
    block = []
    for line in lines[start:]:
        s = line.strip()
        if s.startswith("# #"):       # the next '# # ---' banner ends it
            break
        block.append(re.sub(r"^(\s*)# ?", r"\1", line))
    import textwrap

    src = textwrap.dedent("\n".join(block))
    ns = {"torch": torch, "kl": kl, "Independent": Independent,
          "Normal": Normal, "afcrps_loss": puu.afcrps_loss,
          "crps_loss": puu.crps_loss}
    exec(compile(src, "<reference prob_unet.py:273-317 uncommented>",
                 "exec"), ns)
    return ns["elbo"]


def run_reference(hr_train, hr_val, num_epochs, bs):
    import torch

    cu, pu, puu, tm = _import_reference()

    def make_ds(hr_nhwc):
        ds = cu.climex2torch.__new__(cu.climex2torch)
        ds.hr = torch.tensor(np.moveaxis(hr_nhwc, -1, 1))
        ds.lowres_scale = SCALE
        ds.type = "lrinterp_to_residuals"
        ds.epsilon = 1e-10
        ds.lrstats = None
        t = ds.hr.shape[0]
        ds.timestamps = np.arange(t, dtype=np.float64)
        ds.timestamps_float = np.arange(t, dtype=np.float64)
        return ds

    ds_train, ds_val = make_ds(hr_train), make_ds(hr_val)
    dl_train = torch.utils.data.DataLoader(ds_train, batch_size=bs,
                                           shuffle=True)
    dl_val = torch.utils.data.DataLoader(ds_val, batch_size=bs)

    class AfCRPSProbUNet(pu.ProbabilisticUNet):
        """Reference model with its afCRPS ELBO re-attached: the commented
        variant at src/prob_unet.py:273-317 (whose 3-return signature
        train_probunet_step still calls — SURVEY.md §1 "API drift") is
        UNCOMMENTED FROM THE REFERENCE'S OWN SOURCE at runtime, so the
        A/B drives the reference's exact code without this repo vendoring
        a transcription of it."""

        elbo = _uncomment_reference_afcrps_elbo(puu)

    torch.manual_seed(int(os.environ.get("AB_MODEL_SEED", SEED)))
    model = AfCRPSProbUNet(
        input_channels=len(VARS), num_classes=len(VARS), latent_dim=LATENT,
        num_filters=NUM_FILTERS, model_channels=MODEL_CHANNELS,
        channel_mult=CHANNEL_MULT, beta_0=1.0, beta_1=0.0, beta_2=0.0,
    )
    optimizer = torch.optim.AdamW(params=model.parameters(), lr=LR)

    curves = {"train_recon": [], "train_kl": [], "val_recon": [],
              "val_kl": [], "epoch_seconds": []}
    device = "cpu"
    for epoch in range(1, num_epochs + 1):
        b0, b1 = beta_schedule(epoch, num_epochs)
        model.beta_0, model.beta_1 = b0, b1
        t0 = time.time()
        recon, kl_mean = tm.train_probunet_step(
            model=model, dataloader=dl_train, optimizer=optimizer,
            epoch=epoch, num_epochs=num_epochs, device=device,
            ensemble_size=M_TRAIN,
        )
        val_recon, val_kl = tm.eval_probunet_model(
            model=model, dataloader=dl_val, device=device,
            ensemble_size=M_EVAL,
        )
        dt = time.time() - t0
        curves["train_recon"].append(recon)
        curves["train_kl"].append(kl_mean)
        curves["val_recon"].append(val_recon)
        curves["val_kl"].append(val_kl)
        curves["epoch_seconds"].append(dt)
        print(f"[ref] epoch {epoch}: recon={recon:.4f} kl={kl_mean:.2f} "
              f"val={val_recon:.4f} ({dt:.0f}s)", flush=True)
    return curves


# ---------------------------------------------------------------------------
# Our side
# ---------------------------------------------------------------------------

def run_ours(hr_train, hr_val, num_epochs, bs):
    import jax

    if os.environ.get("PROBUNET_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from probunet_tpu.config import Config
    from probunet_tpu.data.climex import ClimexDataset
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.train.loop import Trainer

    cfg = Config()
    cfg.data.resolution = (RES, RES)
    cfg.data.lowres_scale = SCALE
    cfg.data.pipeline = "lrinterp_to_residuals"
    cfg.data.variables = VARS
    cfg.model.latent_dim = LATENT
    cfg.model.num_filters = tuple(NUM_FILTERS)
    cfg.model.model_channels = MODEL_CHANNELS
    cfg.model.channel_mult = tuple(CHANNEL_MULT)
    cfg.model.compute_dtype = "float32"
    cfg.train.batch_size = bs
    cfg.train.num_epochs = num_epochs
    cfg.train.ensemble_size = M_TRAIN
    cfg.train.eval_ensemble_size = M_EVAL
    cfg.train.lr = LR
    cfg.train.weight_decay = 0.01          # torch AdamW default
    cfg.loss.loss_type = "afcrps"
    cfg.loss.warmup_epochs = WARMUP
    cfg.loss.max_beta_1 = MAX_BETA_1
    # AB_MODEL_SEED varies init/shuffle/sampling only (data seeds fixed) —
    # used to measure the seed-noise band the curve offset is judged against
    cfg.train.seed = int(os.environ.get("AB_MODEL_SEED", SEED))

    ds_train = ClimexDataset(hr=hr_train, pipeline=cfg.data.pipeline,
                             lowres_scale=SCALE, variables=VARS,
                             years=range(1960, 1962))
    ds_val = ClimexDataset(hr=hr_val, pipeline=cfg.data.pipeline,
                           lowres_scale=SCALE, variables=VARS,
                           years=range(1962, 1963))

    model = ProbabilisticUNet(
        input_channels=len(VARS), num_classes=len(VARS),
        latent_dim=LATENT, num_filters=tuple(NUM_FILTERS),
        model_channels=MODEL_CHANNELS, channel_mult=tuple(CHANNEL_MULT),
        img_resolution=(RES, RES), dtype=None,
    )
    trainer = Trainer(cfg, model, ds_train, ds_val)
    curves = {"train_recon": [], "train_kl": [], "val_recon": [],
              "val_kl": [], "epoch_seconds": []}
    from probunet_tpu.train.loop import eval_model, train_epoch
    from probunet_tpu.train.schedule import beta_schedule as our_beta
    import jax.numpy as jnp

    for epoch in range(1, num_epochs + 1):
        b0, b1 = our_beta(epoch, num_epochs, WARMUP, MAX_BETA_1)
        t0 = time.time()
        trainer.state, summary = train_epoch(
            trainer.train_step, trainer.state, ds_train, trainer.stats_dev,
            cfg, b0, b1, epoch,
        )
        val_stats = jax.tree.map(jnp.asarray, ds_val.stats)
        val = eval_model(trainer.eval_step, trainer.state, ds_val, val_stats,
                         cfg, epoch)
        dt = time.time() - t0
        curves["train_recon"].append(summary["recon"])
        curves["train_kl"].append(summary["kl"])
        curves["val_recon"].append(val["recon"])
        curves["val_kl"].append(val["kl"])
        curves["epoch_seconds"].append(dt)
        print(f"[ours] epoch {epoch}: recon={summary['recon']:.4f} "
              f"kl={summary['kl']:.2f} val={val['recon']:.4f} ({dt:.0f}s)",
              flush=True)
    return curves


def overlay(ref, ours, path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    ep_r = np.arange(1, len(ref["train_recon"]) + 1)
    ep_o = np.arange(1, len(ours["train_recon"]) + 1)
    ax = axes[0]
    ax.plot(ep_r, ref["train_recon"], "C0-", label="reference train")
    ax.plot(ep_r, ref["val_recon"], "C0--", label="reference val")
    ax.plot(ep_o, ours["train_recon"], "C1-", label="probunet_tpu train")
    ax.plot(ep_o, ours["val_recon"], "C1--", label="probunet_tpu val")
    ax.set_xlabel("epoch"); ax.set_ylabel("afCRPS (standardized residuals)")
    ax.set_title("reconstruction"); ax.legend(fontsize=8)
    ax = axes[1]
    ax.semilogy(ep_r, ref["train_kl"], "C0-", label="reference")
    ax.semilogy(ep_o, ours["train_kl"], "C1-", label="probunet_tpu")
    ax.set_xlabel("epoch"); ax.set_ylabel("KL(q||p)")
    ax.set_title("KL"); ax.legend(fontsize=8)
    fig.suptitle("Reference (torch, CPU) vs probunet_tpu — same synthetic "
                 "data, same config")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    print(f"wrote {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--side", choices=["both", "reference", "ours"],
                    default="both")
    args = ap.parse_args()

    os.makedirs(OUT, exist_ok=True)
    hr_train, hr_val = make_data()

    tag = ""
    if os.environ.get("AB_MODEL_SEED", str(SEED)) != str(SEED):
        tag = f"_seed{os.environ['AB_MODEL_SEED']}"
    if args.side in ("both", "reference"):
        ref = run_reference(hr_train, hr_val, args.epochs, args.bs)
        with open(os.path.join(OUT, f"reference_curves{tag}.json"), "w") as f:
            json.dump(ref, f, indent=1)
    if args.side in ("both", "ours"):
        ours = run_ours(hr_train, hr_val, args.epochs, args.bs)
        with open(os.path.join(OUT, f"ours_curves{tag}.json"), "w") as f:
            json.dump(ours, f, indent=1)

    rp = os.path.join(OUT, "reference_curves.json")
    op = os.path.join(OUT, "ours_curves.json")
    if os.path.exists(rp) and os.path.exists(op):
        overlay(json.load(open(rp)), json.load(open(op)),
                os.path.join(OUT, "overlay.png"))


if __name__ == "__main__":
    main()
