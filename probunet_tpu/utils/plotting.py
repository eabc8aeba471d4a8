"""Plotting suite (host-side matplotlib; cartopy-gated geo projection).

Re-implements the reference dataset's plotting methods as free functions
over NHWC arrays (the reference couples them to the torch Dataset class,
reference src/climex_utils.py:288-870):

- :func:`plot_batch`           — LR / prediction / HR / |error| rows
  (reference :288-439);
- :func:`plot_sample_batch`    — multi-member ensemble grids (:442-613);
- :func:`plot_residual_sample_batch` — residual-space ensembles (:615-777);
- :func:`plot_residual_differences` — pairwise member differences
  (:779-870);
- plus the training-loop figures: loss/CRPS curves (reference
  src/main.py:218-238), PSD comparison and return-level curves
  (results.ipynb cells 8-10, compare_observed_vs_model_return_levels.ipynb).

When cartopy is importable, map panels use the ClimEx RotatedPole CRS
(pole_longitude=83, pole_latitude=42.5 — the projection the reference
hardcodes); otherwise panels fall back to plain ``imshow``, keeping the
whole suite usable in minimal environments.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

try:
    import cartopy.crs as ccrs
    HAVE_CARTOPY = True
    CLIMEX_CRS = ccrs.RotatedPole(pole_longitude=83.0, pole_latitude=42.5)
except ImportError:  # pragma: no cover
    ccrs = None
    HAVE_CARTOPY = False
    CLIMEX_CRS = None

_CMAPS = {"pr": "Blues", "tasmin": "coolwarm", "tasmax": "coolwarm"}
_UNITS = {"pr": "mm/day", "tasmin": "°C", "tasmax": "°C"}


def _subplots(nrows, ncols, scale=2.4):
    kw = {}
    if HAVE_CARTOPY:
        kw["subplot_kw"] = {"projection": CLIMEX_CRS}
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(scale * ncols, scale * nrows), squeeze=False, **kw
    )
    return fig, axes


def _imshow(ax, field, cmap, vmin=None, vmax=None):
    im = ax.imshow(np.asarray(field), origin="lower", cmap=cmap,
                   vmin=vmin, vmax=vmax)
    ax.set_xticks([])
    ax.set_yticks([])
    return im


def _save(fig, save_path):
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=110)
        plt.close(fig)
    return fig


def plot_batch(
    lr, pred, hr,
    variables: Sequence[str] = ("pr", "tasmin", "tasmax"),
    timestamps=None,
    max_items: int = 4,
    save_path: str | None = None,
):
    """LR / prediction / HR / |error| grid per variable
    (reference src/climex_utils.py:288-439). Inputs are (B, h, w, C) /
    (B, H, W, C) NHWC arrays in physical units."""
    lr, pred, hr = map(np.asarray, (lr, pred, hr))
    b = min(max_items, pred.shape[0])
    figs = {}
    for ci, var in enumerate(variables[: pred.shape[-1]]):
        fig, axes = _subplots(4, b)
        vmin = min(hr[:b, ..., ci].min(), pred[:b, ..., ci].min())
        vmax = max(hr[:b, ..., ci].max(), pred[:b, ..., ci].max())
        cmap = _CMAPS.get(var, "viridis")
        for i in range(b):
            _imshow(axes[0, i], lr[i, ..., ci], cmap, vmin, vmax)
            _imshow(axes[1, i], pred[i, ..., ci], cmap, vmin, vmax)
            im = _imshow(axes[2, i], hr[i, ..., ci], cmap, vmin, vmax)
            err = np.abs(pred[i, ..., ci] - hr[i, ..., ci])
            im_e = _imshow(axes[3, i], err, "Reds")
            if timestamps is not None:
                axes[0, i].set_title(str(timestamps[i]), fontsize=7)
        for row, lab in enumerate(["LR", "pred", "HR", "|err|"]):
            axes[row, 0].set_ylabel(lab)
        fig.colorbar(im, ax=axes[:3, :], shrink=0.6,
                     label=f"{var} [{_UNITS.get(var, '')}]")
        fig.colorbar(im_e, ax=axes[3, :], shrink=0.8)
        fig.suptitle(var)
        figs[var] = _save(fig, save_path and save_path.replace(".png", f"_{var}.png"))
    return figs


def plot_sample_batch(
    samples, hr, lrinterp=None,
    variables: Sequence[str] = ("pr", "tasmin", "tasmax"),
    max_items: int = 3,
    save_path: str | None = None,
):
    """Ensemble-member grid: rows = [lrinterp?, HR, member_1..member_M]
    (reference src/climex_utils.py:442-613). samples: (B, M, H, W, C)."""
    samples, hr = np.asarray(samples), np.asarray(hr)
    b = min(max_items, samples.shape[0])
    m = samples.shape[1]
    figs = {}
    for ci, var in enumerate(variables[: samples.shape[-1]]):
        extra = 1 if lrinterp is None else 2
        fig, axes = _subplots(b, m + extra)
        cmap = _CMAPS.get(var, "viridis")
        for i in range(b):
            vmin = min(hr[i, ..., ci].min(), samples[i, ..., ci].min())
            vmax = max(hr[i, ..., ci].max(), samples[i, ..., ci].max())
            col = 0
            if lrinterp is not None:
                _imshow(axes[i, col], np.asarray(lrinterp)[i, ..., ci],
                        cmap, vmin, vmax)
                if i == 0:
                    axes[i, col].set_title("lrinterp", fontsize=8)
                col += 1
            _imshow(axes[i, col], hr[i, ..., ci], cmap, vmin, vmax)
            if i == 0:
                axes[i, col].set_title("HR", fontsize=8)
            for j in range(m):
                im = _imshow(axes[i, col + 1 + j], samples[i, j, ..., ci],
                             cmap, vmin, vmax)
                if i == 0:
                    axes[i, col + 1 + j].set_title(f"member {j + 1}", fontsize=8)
        fig.colorbar(im, ax=axes, shrink=0.6,
                     label=f"{var} [{_UNITS.get(var, '')}]")
        fig.suptitle(f"{var} — {m}-member ensemble")
        figs[var] = _save(fig, save_path and save_path.replace(".png", f"_{var}.png"))
    return figs


def plot_residual_sample_batch(
    residual_samples, residual_target,
    variables: Sequence[str] = ("pr", "tasmin", "tasmax"),
    max_items: int = 3,
    save_path: str | None = None,
):
    """Residual-space ensemble grid (reference src/climex_utils.py:615-777):
    symmetric diverging colormap centered at 0."""
    s = np.asarray(residual_samples)
    t = np.asarray(residual_target)
    b = min(max_items, s.shape[0])
    m = s.shape[1]
    figs = {}
    for ci, var in enumerate(variables[: s.shape[-1]]):
        fig, axes = _subplots(b, m + 1)
        for i in range(b):
            v = max(np.abs(t[i, ..., ci]).max(), np.abs(s[i, ..., ci]).max())
            _imshow(axes[i, 0], t[i, ..., ci], "RdBu_r", -v, v)
            if i == 0:
                axes[i, 0].set_title("target residual", fontsize=8)
            for j in range(m):
                im = _imshow(axes[i, 1 + j], s[i, j, ..., ci], "RdBu_r", -v, v)
                if i == 0:
                    axes[i, 1 + j].set_title(f"member {j + 1}", fontsize=8)
        fig.colorbar(im, ax=axes, shrink=0.6)
        fig.suptitle(f"{var} — residual ensemble")
        figs[var] = _save(fig, save_path and save_path.replace(".png", f"_{var}.png"))
    return figs


def plot_residual_differences(
    samples,
    variables: Sequence[str] = ("pr", "tasmin", "tasmax"),
    item: int = 0,
    save_path: str | None = None,
):
    """Pairwise member differences for one item
    (reference src/climex_utils.py:779-870): (M, M) grid of member_i -
    member_j panels showing ensemble diversity."""
    s = np.asarray(samples)[item]  # (M, H, W, C)
    m = s.shape[0]
    figs = {}
    for ci, var in enumerate(variables[: s.shape[-1]]):
        fig, axes = _subplots(m, m, scale=1.8)
        diffs = s[:, None, ..., ci] - s[None, :, ..., ci]
        v = max(np.abs(diffs).max(), 1e-12)
        for i in range(m):
            for j in range(m):
                im = _imshow(axes[i, j], diffs[i, j], "RdBu_r", -v, v)
        fig.colorbar(im, ax=axes, shrink=0.6)
        fig.suptitle(f"{var} — pairwise member differences")
        figs[var] = _save(fig, save_path and save_path.replace(".png", f"_{var}.png"))
    return figs


def plot_loss_curves(history: dict, save_path: str | None = None):
    """Train/val recon + KL curves (the losses.pkl / CRPS-curve plots of
    reference src/main.py:218-238)."""
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    epochs = np.arange(1, len(history.get("train_crps", [])) + 1)
    axes[0].plot(epochs, history.get("train_crps", []), label="train")
    if history.get("val_crps"):
        axes[0].plot(np.arange(1, len(history["val_crps"]) + 1),
                     history["val_crps"], label="val")
    axes[0].set_xlabel("epoch"); axes[0].set_ylabel("reconstruction")
    axes[0].legend(); axes[0].set_title("reconstruction loss")
    axes[1].plot(epochs, history.get("train_kl", []), label="train")
    if history.get("val_kl"):
        axes[1].plot(np.arange(1, len(history["val_kl"]) + 1),
                     history["val_kl"], label="val")
    axes[1].set_xlabel("epoch"); axes[1].set_ylabel("KL(q||p)")
    axes[1].set_yscale("log"); axes[1].legend(); axes[1].set_title("KL")
    fig.tight_layout()
    return _save(fig, save_path)


def plot_psd(
    psd_dict: dict,
    variables: Sequence[str] = ("pr", "tasmin", "tasmax"),
    save_path: str | None = None,
):
    """GT-vs-model radially-averaged PSD + ratio panels (results.ipynb
    cells 8-10). psd_dict: {"gt": (k, C), name: (k, C), ...}."""
    gt = np.asarray(psd_dict["gt"])
    nvar = gt.shape[-1]
    fig, axes = plt.subplots(2, nvar, figsize=(4 * nvar, 7), squeeze=False)
    k = np.arange(1, gt.shape[0])
    for ci in range(nvar):
        var = variables[ci] if ci < len(variables) else f"var{ci}"
        for name, spec in psd_dict.items():
            spec = np.asarray(spec)
            axes[0, ci].loglog(k, spec[1:, ci], label=name,
                               lw=2 if name == "gt" else 1)
            if name != "gt":
                axes[1, ci].semilogx(k, spec[1:, ci] / gt[1:, ci], label=name)
        axes[1, ci].axhline(1.0, color="k", lw=0.5)
        axes[0, ci].set_title(var); axes[0, ci].legend(fontsize=7)
        axes[1, ci].set_xlabel("wavenumber")
        axes[1, ci].set_ylabel("model/GT power")
    axes[0, 0].set_ylabel("power")
    fig.tight_layout()
    return _save(fig, save_path)


def plot_histograms(
    hist_dict: dict,
    save_path: str | None = None,
):
    """Pooled pixel-value log-frequency histograms, GT vs model variants
    (results.ipynb cell 15). ``hist_dict`` is
    :func:`probunet_tpu.evals.histograms.compare_histograms` output:
    {var: {"bins": centers, "gt": log_counts, name: log_counts, ...}}."""
    variables = list(hist_dict)
    fig, axes = plt.subplots(1, len(variables),
                             figsize=(4.5 * len(variables), 4), squeeze=False)
    for ci, var in enumerate(variables):
        entry = hist_dict[var]
        bins = np.asarray(entry["bins"])
        ax = axes[0, ci]
        for name, logc in entry.items():
            if name == "bins":
                continue
            ax.plot(bins, np.asarray(logc), label=name,
                    lw=2 if name == "gt" else 1)
        ax.set_title(var)
        ax.set_xlabel("value")
        ax.legend(fontsize=7)
    axes[0, 0].set_ylabel("log10 frequency")
    fig.tight_layout()
    return _save(fig, save_path)


def plot_return_levels(
    analysis: dict,
    observed_analysis: dict | None = None,
    label: str = "model",
    save_path: str | None = None,
):
    """Return-level curves with bootstrap CI + empirical points
    (test_return_levels.ipynb / compare_observed_vs_model_return_levels
    .ipynb). ``analysis`` is :func:`probunet_tpu.evals.gev
    .return_level_analysis` output."""
    fig, ax = plt.subplots(figsize=(6, 4))

    def draw(a, name, color):
        t = a["return_periods"]
        ax.semilogx(t, a["return_levels"], color=color, label=f"{name} GEV fit")
        ax.fill_between(t, a["bootstrap"]["lower"], a["bootstrap"]["upper"],
                        color=color, alpha=0.2, label=f"{name} 95% CI")
        ax.semilogx(a["empirical_return_periods"], a["empirical_levels"],
                    "o", ms=3, color=color, label=f"{name} empirical")

    draw(analysis, label, "C0")
    if observed_analysis is not None:
        draw(observed_analysis, "observed", "C1")
    ax.set_xlabel("return period [years]")
    ax.set_ylabel("return level")
    ax.legend(fontsize=7)
    fig.tight_layout()
    return _save(fig, save_path)


def plot_latent_grid(
    decoded: np.ndarray,
    channel: int = 0,
    per_panel_norm: bool = False,
    title: str = "latent grid",
    save_path: str | None = None,
):
    """(n1, n2, H, W, C) decoded latent grid -> n1 x n2 image panel
    (reference src/latent_exploration.py:893-921,
    src/latent_explore_single_prior.py:183-193)."""
    d = np.asarray(decoded)[..., channel]
    n1, n2 = d.shape[:2]
    fig, axes = _subplots(n1, n2, scale=1.6)
    v = np.abs(d).max()
    for i in range(n1):
        for j in range(n2):
            if per_panel_norm:
                vmax = max(np.abs(d[i, j]).max(), 1e-12)
            else:
                vmax = v
            im = _imshow(axes[i, j], d[i, j], "RdBu_r", -vmax, vmax)
    fig.colorbar(im, ax=axes, shrink=0.6)
    fig.suptitle(title)
    return _save(fig, save_path)
