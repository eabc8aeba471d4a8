"""WMSE weight-function analysis.

Port of the loss-weight study (reference src/notebooks/weight_function.ipynb,
~300 LoC of notebook cells): the WMSE weight w(y) = min(alpha * e^{beta*y}, 1)
(reference src/prob_unet_utils.py:292) evaluated over the distribution of
standardized targets, per variable — used to choose (alpha, beta) so that
extreme targets get full weight while the bulk is down-weighted.
"""

from __future__ import annotations

import numpy as np

from probunet_tpu.ops.losses import wmse_weights


def weight_function_analysis(
    targets: np.ndarray,
    alpha: float = 0.007,
    beta: float = 0.048,
    bins: int = 80,
    variables=("pr", "tasmin", "tasmax"),
) -> dict:
    """Distribution of w(y) over targets per variable.

    targets: (T, H, W, C) standardized targets (residuals). Returns per
    variable: target histogram, weight curve over the target range, mean
    weight, and the saturated fraction (w == 1).
    """
    t = np.asarray(targets)
    out = {}
    for ci, var in enumerate(variables[: t.shape[-1]]):
        y = t[..., ci].reshape(-1)
        w = np.asarray(wmse_weights(y, alpha=alpha, beta=beta))
        counts, edges = np.histogram(y, bins=bins)
        centers = 0.5 * (edges[:-1] + edges[1:])
        out[var] = {
            "target_bins": centers,
            "target_counts": counts,
            "weight_curve": np.asarray(
                wmse_weights(centers, alpha=alpha, beta=beta)
            ),
            "mean_weight": float(w.mean()),
            "saturated_fraction": float((w >= 1.0 - 1e-12).mean()),
            "alpha": alpha,
            "beta": beta,
        }
    return out


def plot_weight_function(analysis: dict, save_path: str | None = None):
    """Target histogram (log counts) + weight curve per variable — the
    weight_function.ipynb figure."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    nvar = len(analysis)
    fig, axes = plt.subplots(1, nvar, figsize=(4.5 * nvar, 3.5), squeeze=False)
    for ax, (var, a) in zip(axes[0], analysis.items()):
        ax.bar(a["target_bins"], a["target_counts"],
               width=np.diff(a["target_bins"]).mean(), alpha=0.4,
               label="targets")
        ax.set_yscale("log")
        ax2 = ax.twinx()
        ax2.plot(a["target_bins"], a["weight_curve"], "C1",
                 label=f"w(y), sat={a['saturated_fraction']:.2%}")
        ax2.set_ylim(0, 1.05)
        ax.set_title(f"{var} (mean w={a['mean_weight']:.3f})")
        ax.set_xlabel("standardized target")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=110)
        plt.close(fig)
    return fig
