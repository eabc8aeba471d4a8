"""Tests for the EDA module (seasonal stats, doy profiles, Spearman maps)."""

import numpy as np
import pytest

from probunet_tpu.data.eda import (
    ClimexEDA,
    SEASONS,
    _rank,
    day_of_year,
    season_of_doy,
)


def test_day_of_year_and_seasons():
    doy = day_of_year(365 * 2)
    assert doy.max() == 364 and doy[365] == 0
    s = season_of_doy(np.array([0, 59, 60, 200, 364]))
    # Jan 1 DJF; Mar 1 (doy 59) MAM; Jul (doy 200) JJA; Dec 31 DJF
    assert s[0] == 0 and s[1] == 1 and s[3] == 2 and s[4] == 0


def test_rank_matches_scipy():
    from scipy.stats import rankdata
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 4, 3))
    got = _rank(x, axis=0)
    want = rankdata(x, method="ordinal", axis=0) - 1
    np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def eda():
    rng = np.random.default_rng(1)
    t, h, w = 365 * 3, 8, 8
    # annual cycle peaking mid-July (doy ~196), trough mid-January
    season_cycle = np.sin(
        2 * np.pi * (np.arange(t) - 105) / 365
    )[:, None, None]
    base = 10 * season_cycle + rng.standard_normal((t, h, w))
    hr = np.stack([np.abs(base), base, base + 5], axis=-1).astype(np.float32)
    return ClimexEDA(hr)


def test_seasonal_stats(eda):
    stats = eda.seasonal_stats("tasmin")
    assert set(stats) == set(SEASONS)
    for s in stats.values():
        assert s["mean"].shape == (8, 8)
        assert np.all(s["q25"] <= s["q75"] + 1e-9)
        assert np.all(s["min"] <= s["max"])
    # summer warmer than winter for the sinusoidal series (peak ~doy 91 MAM/JJA)
    assert stats["JJA"]["mean"].mean() > stats["DJF"]["mean"].mean()


def test_interannual_series(eda):
    series = eda.interannual_seasonal_series("tasmin", "JJA", "mean")
    assert series.shape == (3,)
    assert np.all(np.isfinite(series))


def test_doy_profile(eda):
    prof = eda.doy_profile("tasmin", along="rlat")
    assert prof.shape == (365, 8)
    # seasonal cycle visible: mid-July peak warmer than mid-January trough
    assert prof[196].mean() > prof[14].mean()


def test_spearman_crosscorrelation(eda):
    corr = eda.spearman_crosscorrelation("tasmin", (4, 4))
    assert corr.shape == (8, 8)
    np.testing.assert_allclose(corr[4, 4], 1.0, atol=1e-12)
    # shared seasonal cycle => strongly positive correlations everywhere
    assert corr.min() > 0.5


def test_lagged_autocorrelation(eda):
    ac = eda.lagged_autocorrelation("tasmin", lags=(1, 30))
    assert set(ac) == {1, 30}
    # smooth seasonal signal: lag-1 autocorrelation > lag-30
    assert ac[1].mean() > ac[30].mean() > 0
