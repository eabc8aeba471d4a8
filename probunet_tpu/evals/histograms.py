"""Distribution-fidelity histograms.

Port of the log-frequency histogram analysis (reference
src/notebooks/results.ipynb cell 15): pooled pixel-value histograms of
ground truth vs model ensembles on a common binning, log-scaled counts.
Computed on device with ``jnp.histogram``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def log_histogram(
    values,
    bins: int = 100,
    value_range: tuple[float, float] | None = None,
    density: bool = False,
):
    """Histogram of pooled pixel values with log10 counts.

    values: array of any shape (flattened). Returns (bin_centers, counts,
    log10_counts). Zero-count bins get log10 -> -inf replaced by nan for
    clean plotting (the notebook uses log-scale axes, same effect).
    """
    v = jnp.asarray(values).reshape(-1)
    if value_range is None:
        value_range = (float(v.min()), float(v.max()))
    counts, edges = jnp.histogram(v, bins=bins, range=value_range,
                                  density=density)
    centers = 0.5 * (edges[:-1] + edges[1:])
    counts_np = np.asarray(counts, dtype=np.float64)
    with np.errstate(divide="ignore"):
        log_counts = np.where(counts_np > 0, np.log10(counts_np), np.nan)
    return np.asarray(centers), counts_np, log_counts


def compare_histograms(
    groundtruth,
    model_fields: dict,
    bins: int = 100,
    per_variable: bool = True,
    variables=("pr", "tasmin", "tasmax"),
):
    """GT-vs-models pooled histograms on shared bins, per variable
    (the results.ipynb cell-15 comparison across 4 model variants).

    groundtruth: (T, H, W, C); model_fields: {name: (T, [M,] H, W, C)}.
    Returns {var: {"bins": centers, "gt": log_counts, name: log_counts...}}.
    """
    gt = np.asarray(groundtruth)
    out = {}
    for ci, var in enumerate(variables[: gt.shape[-1]]):
        gv = gt[..., ci].reshape(-1)
        lo, hi = float(gv.min()), float(gv.max())
        for f in model_fields.values():
            fv = np.asarray(f)[..., ci]
            lo, hi = min(lo, float(fv.min())), max(hi, float(fv.max()))
        centers, _, gt_log = log_histogram(gv, bins, (lo, hi))
        entry = {"bins": centers, "gt": gt_log}
        for name, f in model_fields.items():
            _, _, m_log = log_histogram(
                np.asarray(f)[..., ci].reshape(-1), bins, (lo, hi)
            )
            entry[name] = m_log
        out[var] = entry
    return out
