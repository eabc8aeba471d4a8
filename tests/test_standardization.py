"""Standardization-mode variants + residual-contribution metric."""

import jax.numpy as jnp
import numpy as np
import pytest

from probunet_tpu.data.climex import (
    compute_stats,
    invstand_residual,
    preprocess_batch,
    residual_to_hr,
)
from probunet_tpu.evals import residual_contribution


@pytest.fixture(scope="module")
def hr_and_stats():
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.standard_normal((12, 16, 16, 2)) * 3 + 5, jnp.float32)
    stats = compute_stats(hr, 4)
    return hr, stats


def test_stats_minmax_fields(hr_and_stats):
    hr, stats = hr_and_stats
    assert stats.lr_min.shape == (4, 4, 2)
    assert stats.hr_min.shape == (16, 16, 2)
    assert np.all(np.asarray(stats.lr_min) <= np.asarray(stats.lr_max))


@pytest.mark.parametrize("mode", ["none", "perpixel", "pertimestep", "minmax"])
def test_modes_roundtrip(hr_and_stats, mode):
    hr, stats = hr_and_stats
    batch = preprocess_batch(hr, stats, "lrinterp_to_residuals", 4,
                             standardization=mode)
    assert np.all(np.isfinite(np.asarray(batch["targets"])))

    item_stats = batch.get("stand_stats")
    if mode == "pertimestep":
        assert item_stats is not None
    # residual_to_hr(targets) must reconstruct the original HR field
    rec = residual_to_hr(batch["targets"], batch["lrinterp"], stats,
                         "lrinterp_to_residuals", standardization=mode,
                         item_stats=item_stats)
    # perpixel/minmax/pertimestep standardize hr and lrinterp with the SAME
    # (HR-grid) stats, so hr_stand - lrinterp_stand unscales exactly back
    np.testing.assert_allclose(np.asarray(rec), np.asarray(hr),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pipeline", ["lr_to_hr", "lr_to_residuals",
                                      "lrinterp_to_residuals",
                                      "lrinterp_to_hr"])
@pytest.mark.parametrize("mode", ["none", "perpixel", "pertimestep", "minmax"])
def test_all_pipelines_roundtrip(hr_and_stats, pipeline, mode):
    """residual_to_hr(preprocess(hr).targets) == hr for every pipeline x
    standardization combination where the inversion is exact.

    The *_to_hr pipelines must NOT re-add lrinterp (the model output IS the
    standardized HR field — adding the baseline on top double-counts it).
    lr_to_residuals standardizes LR with LR-space stats, so only modes whose
    LR stats lift exactly to the HR grid (perpixel/minmax via
    repeat_interleave + nearest upsampling, and none) invert exactly;
    pertimestep there mixes the LR field's own stats with the HR item stats
    and has no exact inverse — skipped, as in the reference (its baseline
    stack only ever inverts the lrinterp residual pipeline,
    src/baseline/climex_utils.py:208-212).
    """
    if pipeline == "lr_to_residuals" and mode == "pertimestep":
        pytest.skip("no exact inverse (LR-space vs item stats mismatch)")
    hr, stats = hr_and_stats
    batch = preprocess_batch(hr, stats, pipeline, 4, interp_mode="nearest",
                             standardization=mode)
    from probunet_tpu.data.climex import lrinterp_from_batch

    lrinterp = lrinterp_from_batch(batch, 4, "nearest")
    rec = residual_to_hr(batch["targets"], lrinterp, stats, pipeline,
                         standardization=mode,
                         item_stats=batch.get("stand_stats"))
    assert rec.shape == hr.shape
    np.testing.assert_allclose(np.asarray(rec), np.asarray(hr),
                               rtol=1e-4, atol=1e-4)


def test_to_hr_pipeline_does_not_double_count_baseline(hr_and_stats):
    """Regression: residual_to_hr for lrinterp_to_hr used to add lrinterp on
    top of the already-mean-restored field."""
    hr, stats = hr_and_stats
    batch = preprocess_batch(hr, stats, "lrinterp_to_hr", 4)
    rec = residual_to_hr(batch["targets"], batch["lrinterp"], stats,
                         "lrinterp_to_hr")
    err_fixed = float(jnp.abs(rec - hr).mean())
    err_double = float(jnp.abs(rec + batch["lrinterp"] - hr).mean())
    assert err_fixed < 1e-3 < err_double


def test_minmax_inputs_in_unit_range(hr_and_stats):
    hr, stats = hr_and_stats
    batch = preprocess_batch(hr, stats, "lr_to_hr", 4, standardization="minmax")
    x = np.asarray(batch["inputs"])
    assert x.min() >= -1e-6 and x.max() <= 1.0 + 1e-6


def test_pertimestep_zero_mean_unit_std(hr_and_stats):
    hr, stats = hr_and_stats
    batch = preprocess_batch(hr, stats, "lr_to_hr", 4,
                             standardization="pertimestep")
    x = np.asarray(batch["targets"])  # standardized hr
    np.testing.assert_allclose(x.mean(axis=(1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(x.std(axis=(1, 2)), 1.0, atol=1e-3)


def test_pertimestep_requires_item_stats(hr_and_stats):
    hr, stats = hr_and_stats
    with pytest.raises(ValueError, match="item_stats"):
        invstand_residual(hr, stats, "lrinterp_to_residuals",
                          standardization="pertimestep")


def test_residual_contribution():
    rng = np.random.default_rng(1)
    hr = rng.standard_normal((4, 8, 8, 2)).astype(np.float32)
    lrinterp = hr + 1.0                      # interp off by 1
    pred = hr + 0.25                         # model off by 0.25
    out = residual_contribution(pred, lrinterp, hr)
    np.testing.assert_allclose(out["mae_interp"], 1.0, rtol=1e-5)
    np.testing.assert_allclose(out["mae_model"], 0.25, rtol=1e-5)
    np.testing.assert_allclose(out["improvement"], 0.75, rtol=1e-5)

    # ensemble axis collapses to the mean
    ens = np.stack([hr + 0.2, hr + 0.3], axis=1)
    out2 = residual_contribution(ens, lrinterp, hr)
    np.testing.assert_allclose(out2["mae_model"], 0.25, rtol=1e-5)
