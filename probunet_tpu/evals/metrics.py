"""On-device ensemble evaluation metrics.

Parity targets (reference src/metrics.py):
- ``crps_over_groundtruth`` (reference src/metrics.py:11-46) — per-variable
  mean/std over per-timestep empirical CRPS of an (T, M, H, W, C) ensemble
  vs (T, H, W, C) ground truth. The reference delegates to
  ``pysteps.verification.probscores.CRPS`` (host numpy, one call per
  timestep per variable); here the whole thing is ONE jitted sort-based
  O(M log M) CRPS over the full array — the same estimator (empirical /
  fair-form CRPS), computed on device.
- ``compute_mae`` (reference src/metrics.py:48-70) — MAE of the ensemble
  mean, per variable.

Layouts are NHWC (ensembles: T, M, H, W, C) — the TPU-native layout used
throughout this framework.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from probunet_tpu.ops.losses import crps_empirical


@jax.jit
def _crps_fields(ensemble: jax.Array, truth: jax.Array):
    """Pointwise empirical CRPS: ensemble (T, M, H, W, C), truth (T, H, W, C)
    -> (T, H, W, C)."""
    # crps_empirical expects the sample axis first
    return crps_empirical(jnp.moveaxis(ensemble, 1, 0), truth)


def crps_over_groundtruth(ensemble, truth) -> dict[str, jax.Array]:
    """Per-variable CRPS summary (reference src/metrics.py:11-46).

    Returns {"mean": (C,), "std": (C,), "per_timestep": (T, C)} where std is
    over the per-timestep spatial-mean CRPS values, exactly the statistic the
    reference reports (mean ± std across test days).
    """
    fields = _crps_fields(jnp.asarray(ensemble), jnp.asarray(truth))
    per_t = fields.mean(axis=(1, 2))          # (T, C)
    return {
        "mean": per_t.mean(axis=0),
        "std": per_t.std(axis=0),
        "per_timestep": per_t,
    }


def compute_mae(ensemble, truth) -> dict[str, jax.Array]:
    """MAE of the ensemble mean, per variable
    (reference src/metrics.py:48-70). Same return structure as
    :func:`crps_over_groundtruth`."""
    err = jnp.abs(jnp.asarray(ensemble).mean(axis=1) - jnp.asarray(truth))
    per_t = err.mean(axis=(1, 2))              # (T, C)
    return {
        "mean": per_t.mean(axis=0),
        "std": per_t.std(axis=0),
        "per_timestep": per_t,
    }


# alias matching this package's naming convention
mae_over_groundtruth = compute_mae


def residual_contribution(pred_hr, lrinterp, hr) -> dict[str, float]:
    """How much the learned residual improves over plain interpolation
    (reference src/train_prob_unet_model.py:307-349, which reports e.g. a
    29.11% MAE improvement for the 30-epoch afCRPS model — BASELINE.md).

    pred_hr: (T, [M,] H, W, C) model HR prediction (ensemble mean is used);
    lrinterp: (T, H, W, C) interpolation baseline; hr: ground truth.
    """
    p = jnp.asarray(pred_hr)
    if p.ndim == 5:
        p = p.mean(axis=1)
    mae_model = jnp.abs(p - hr).mean()
    mae_interp = jnp.abs(jnp.asarray(lrinterp) - hr).mean()
    improvement = 1.0 - mae_model / mae_interp
    return {
        "mae_model": float(mae_model),
        "mae_interp": float(mae_interp),
        "improvement": float(improvement),
    }


def ensemble_spread(ensemble) -> jax.Array:
    """Per-variable mean ensemble standard deviation (spread) — the
    collapse-diagnostic scalar used throughout the reference's latent
    exploration (e.g. reference src/latent_exploration.py:302-327)."""
    e = jnp.asarray(ensemble)
    return e.std(axis=1, ddof=1).mean(axis=(0, 1, 2))
