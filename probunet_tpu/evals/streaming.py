"""Streaming (constant-host-memory) ensemble evaluation.

The reference evaluates by materializing the full (T, M, H, W, C) ensemble
in host memory before computing metrics (reference src/metrics.py:11-70
iterates a preloaded tensor; src/notebooks/results.ipynb cells 12-15 stack
every batch). At real scale — the 3,650-day test split at M=16 — that is
~11.5 GB crossing the slow host<->device link twice. Here every metric the
evaluate path reports is reduced ON DEVICE per batch inside one jit, and
only O(B*C + k*C) partial rows ever reach the host:

- empirical CRPS / MAE of the ensemble mean / ensemble spread: per-item
  (B, C) rows — concatenating them over batches reproduces the materialized
  per-timestep tables bit-for-bit (same ops on the same items).
- radially-averaged PSD of GT and of the ensemble mean: per-batch (k, C)
  SUMS over items; dividing by T at the end equals
  :func:`probunet_tpu.evals.psd.psd_over_dataset` on the full stack.
- per-variable running min/max of GT and ensemble: exactly the shared bin
  range :func:`probunet_tpu.evals.histograms.compare_histograms` derives
  from the pooled arrays, enabling an exact second histogram pass
  (histogram counts are additive across batches on fixed edges).

Nothing here assumes a particular sampler: feed any (ens, gt) device pair
per batch, e.g. the member-mesh-parallel one (parallel/member_parallel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.evals.psd import psd
from probunet_tpu.ops.losses import crps_empirical


@jax.jit
def _batch_partials(ens: jax.Array, gt: jax.Array) -> dict[str, jax.Array]:
    """One device pass over a batch: ens (B, M, H, W, C), gt (B, H, W, C)
    -> small per-item / per-batch reductions (everything host-bound is
    O(B*C) or O(k*C))."""
    # per-item spatial-mean empirical CRPS (reference src/metrics.py:11-46)
    crps_pt = crps_empirical(jnp.moveaxis(ens, 1, 0), gt).mean(axis=(1, 2))
    # MAE of the ensemble mean (reference src/metrics.py:48-70)
    emean = ens.mean(axis=1)
    mae_pt = jnp.abs(emean - gt).mean(axis=(1, 2))
    # per-item mean ensemble std — averaging the (B, C) rows over T equals
    # the materialized std(axis=1).mean((0,1,2)) since H, W are constant
    spread_pt = ens.std(axis=1, ddof=1).mean(axis=(1, 2))
    # PSD partial SUMS over the batch axis (mean taken on host at the end)
    psd_gt_sum = psd(gt).sum(axis=0)
    psd_model_sum = psd(emean).sum(axis=0)
    # running-range partials for the shared histogram binning
    reduce_axes = tuple(range(gt.ndim - 1))
    ens_axes = tuple(range(ens.ndim - 1))
    return {
        "crps_pt": crps_pt,
        "mae_pt": mae_pt,
        "spread_pt": spread_pt,
        "psd_gt_sum": psd_gt_sum,
        "psd_model_sum": psd_model_sum,
        "gt_min": gt.min(axis=reduce_axes),
        "gt_max": gt.max(axis=reduce_axes),
        "ens_min": ens.min(axis=ens_axes),
        "ens_max": ens.max(axis=ens_axes),
    }


@partial(jax.jit, static_argnames=("bins",))
def _batch_hist(values: jax.Array, lo: jax.Array, hi: jax.Array,
                bins: int) -> jax.Array:
    """Per-variable histogram counts of pooled pixels on fixed shared edges.

    values: (..., C); lo/hi: (C,) the global range from the metric pass.
    Returns (C, bins) counts — additive across batches, so summing per-batch
    results equals one histogram of the fully pooled array.
    """
    v = values.reshape(-1, values.shape[-1])          # (N, C)
    # jnp.histogram semantics: `bins` uniform buckets over [lo, hi], values
    # outside dropped, hi itself included in the last bucket.
    width = (hi - lo) / bins
    idx = jnp.floor((v - lo[None, :]) / width[None, :]).astype(jnp.int32)
    idx = jnp.where(v == hi[None, :], bins - 1, idx)  # right-closed last bin
    valid = (idx >= 0) & (idx < bins)
    idx = jnp.clip(idx, 0, bins - 1)

    def one_var(col_idx, col_valid):
        return jnp.zeros((bins,), jnp.float32).at[col_idx].add(
            col_valid.astype(jnp.float32))

    return jax.vmap(one_var, in_axes=(1, 1))(idx, valid)  # (C, bins)


class EvalAccumulator:
    """Accumulates per-batch device partials; never holds fields on host.

    Usage::

        acc = EvalAccumulator()
        for batch:   acc.update(ens, gt)         # pass 1 (metrics + ranges)
        for batch:   acc.update_hist(ens, gt)    # optional pass 2 (figures)
        out = acc.result()
    """

    def __init__(self, hist_bins: int = 100):
        self.hist_bins = hist_bins
        self._rows: list[dict[str, np.ndarray]] = []
        self._psd_gt = None
        self._psd_model = None
        self._n_items = 0
        self._lo = None
        self._hi = None
        self._hist_gt = None
        self._hist_model = None

    def update(self, ens, gt) -> None:
        p = jax.device_get(_batch_partials(jnp.asarray(ens), jnp.asarray(gt)))
        self._rows.append(
            {k: np.asarray(p[k]) for k in ("crps_pt", "mae_pt", "spread_pt")})
        self._n_items += int(np.asarray(p["crps_pt"]).shape[0])
        if self._psd_gt is None:
            self._psd_gt = np.asarray(p["psd_gt_sum"], np.float64)
            self._psd_model = np.asarray(p["psd_model_sum"], np.float64)
            self._lo = np.minimum(p["gt_min"], p["ens_min"])
            self._hi = np.maximum(p["gt_max"], p["ens_max"])
        else:
            self._psd_gt += np.asarray(p["psd_gt_sum"], np.float64)
            self._psd_model += np.asarray(p["psd_model_sum"], np.float64)
            self._lo = np.minimum(self._lo,
                                  np.minimum(p["gt_min"], p["ens_min"]))
            self._hi = np.maximum(self._hi,
                                  np.maximum(p["gt_max"], p["ens_max"]))

    def hist_range(self) -> tuple[np.ndarray, np.ndarray]:
        """(lo, hi) per variable — the shared binning of the pooled GT and
        every model field, as compare_histograms derives it."""
        return np.asarray(self._lo), np.asarray(self._hi)

    def update_hist(self, ens, gt) -> None:
        """Second-pass histogram accumulation on the pass-1 global range."""
        lo = jnp.asarray(self._lo, jnp.float32)
        hi = jnp.asarray(self._hi, jnp.float32)
        hg = _batch_hist(jnp.asarray(gt, jnp.float32), lo, hi, self.hist_bins)
        hm = _batch_hist(jnp.asarray(ens, jnp.float32), lo, hi, self.hist_bins)
        hg, hm = np.asarray(hg, np.float64), np.asarray(hm, np.float64)
        if self._hist_gt is None:
            self._hist_gt, self._hist_model = hg, hm
        else:
            self._hist_gt += hg
            self._hist_model += hm

    def result(self) -> dict:
        """Assemble the final tables; identical to the materialized-path
        outputs of evals.metrics / evals.psd on the concatenated data."""
        crps = np.concatenate([r["crps_pt"] for r in self._rows])   # (T, C)
        mae = np.concatenate([r["mae_pt"] for r in self._rows])
        spread = np.concatenate([r["spread_pt"] for r in self._rows])
        t = self._n_items
        out = {
            "items": t,
            "crps": {"mean": crps.mean(axis=0), "std": crps.std(axis=0),
                     "per_timestep": crps},
            "mae": {"mean": mae.mean(axis=0), "std": mae.std(axis=0),
                    "per_timestep": mae},
            "spread": spread.mean(axis=0),
            "psd_gt": self._psd_gt / t,
            "psd_model": self._psd_model / t,
        }
        if self._hist_gt is not None:
            lo, hi = self.hist_range()
            edges = lo[:, None] + (hi - lo)[:, None] * np.linspace(
                0.0, 1.0, self.hist_bins + 1)[None, :]        # (C, bins+1)
            centers = 0.5 * (edges[:, :-1] + edges[:, 1:])
            with np.errstate(divide="ignore"):
                log_gt = np.where(self._hist_gt > 0,
                                  np.log10(self._hist_gt), np.nan)
                log_model = np.where(self._hist_model > 0,
                                     np.log10(self._hist_model), np.nan)
            out["hist"] = {"centers": centers, "lo": lo, "hi": hi,
                           "gt_counts": self._hist_gt,
                           "model_counts": self._hist_model,
                           "gt_log": log_gt, "model_log": log_model}
        return out
