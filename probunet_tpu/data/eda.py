"""Exploratory data analysis over the packed ClimEx stack.

Re-implementation of ``climexEDA`` (reference src/baseline/climex_utils.py:
367-696). The reference runs lazily over NetCDF with dask + bottleneck
rank gufuncs; here the packed (T, H, W, C) array is analyzed directly with
vectorized numpy (rank transforms via double argsort) and optional
time-chunking — the datasets that fit the training pipeline fit in host RAM,
and each statistic is a single vectorized pass instead of a dask graph.

Covers:
- seasonal interannual statistics (mean/median/quartiles/min/max per season
  per year, and their maps) — reference :436-464;
- day-of-year profiles along rlat/rlon — reference :467-526;
- Spearman cross-correlation maps against a reference pixel — reference
  :543-582 (rankdata gufunc at :529-540);
- lagged Spearman autocorrelation per pixel — reference :585-644.

Plotting lives in probunet_tpu.utils.plotting (seasonal maps are plain
field panels).
"""

from __future__ import annotations

import numpy as np

SEASONS = {
    "DJF": (12, 1, 2),
    "MAM": (3, 4, 5),
    "JJA": (6, 7, 8),
    "SON": (9, 10, 11),
}

# noleap-calendar month of each day-of-year (0-based doy)
_MONTH_LEN = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
_DOY_MONTH = np.repeat(np.arange(1, 13), _MONTH_LEN)


def day_of_year(t: int) -> np.ndarray:
    """0-based day-of-year for a T-day noleap daily series starting Jan 1."""
    return np.arange(t) % 365


def season_of_doy(doy: np.ndarray) -> np.ndarray:
    """Season label index (0=DJF, 1=MAM, 2=JJA, 3=SON) per 0-based doy."""
    month = _DOY_MONTH[doy % 365]
    out = np.empty(month.shape, np.int8)
    for i, (_, months) in enumerate(SEASONS.items()):
        for m in months:
            out[month == m] = i
    return out


def _rank(x: np.ndarray, axis: int = 0) -> np.ndarray:
    """Average-free (ordinal) rank transform along ``axis`` via double
    argsort — the vectorized stand-in for the reference's bottleneck
    ``rankdata`` gufunc (reference src/baseline/climex_utils.py:529-540)."""
    order = np.argsort(x, axis=axis, kind="stable")
    ranks = np.empty_like(order)
    np.put_along_axis(
        ranks, order,
        np.broadcast_to(
            np.arange(x.shape[axis]).reshape(
                [-1 if a == axis else 1 for a in range(x.ndim)]
            ),
            x.shape,
        ),
        axis=axis,
    )
    return ranks.astype(np.float64)


def _pearson(a: np.ndarray, b: np.ndarray, axis: int = 0) -> np.ndarray:
    a = a - a.mean(axis=axis, keepdims=True)
    b = b - b.mean(axis=axis, keepdims=True)
    num = (a * b).sum(axis=axis)
    den = np.sqrt((a * a).sum(axis=axis) * (b * b).sum(axis=axis))
    return num / np.where(den == 0, 1.0, den)


class ClimexEDA:
    """EDA over a (T, H, W, C) daily stack (physical units).

    ``variables`` names the channel axis; ``doy`` is the 0-based day-of-year
    per timestep (noleap) — defaults to a Jan-1-aligned series.
    """

    def __init__(self, hr: np.ndarray, variables=("pr", "tasmin", "tasmax"),
                 doy: np.ndarray | None = None):
        self.hr = np.asarray(hr)
        self.variables = tuple(variables)
        t = self.hr.shape[0]
        self.doy = day_of_year(t) if doy is None else np.asarray(doy)
        self.season = season_of_doy(self.doy)
        self.year = np.arange(t) // 365

    def _var(self, var) -> np.ndarray:
        ci = self.variables.index(var) if isinstance(var, str) else var
        return self.hr[..., ci]

    # ------------------------------------------------------------------
    def seasonal_stats(self, var) -> dict[str, dict[str, np.ndarray]]:
        """Per-season (H, W) maps of mean/median/q25/q75/min/max over all
        days in the season (reference :436-464, map flavor)."""
        x = self._var(var)
        out = {}
        for i, name in enumerate(SEASONS):
            xs = x[self.season == i]
            out[name] = {
                "mean": xs.mean(axis=0),
                "median": np.median(xs, axis=0),
                "q25": np.quantile(xs, 0.25, axis=0),
                "q75": np.quantile(xs, 0.75, axis=0),
                "min": xs.min(axis=0),
                "max": xs.max(axis=0),
            }
        return out

    def interannual_seasonal_series(self, var, season: str,
                                    stat: str = "mean") -> np.ndarray:
        """(n_years,) domain-aggregate of one season per year — the
        interannual variability series (reference :436-464)."""
        x = self._var(var)
        si = list(SEASONS).index(season)
        fns = {"mean": np.mean, "median": np.median,
               "min": np.min, "max": np.max,
               "q25": lambda a: np.quantile(a, 0.25),
               "q75": lambda a: np.quantile(a, 0.75)}
        fn = fns[stat]
        years = np.unique(self.year)
        sel = self.season == si
        return np.array([
            fn(x[sel & (self.year == y)]) for y in years
            if (sel & (self.year == y)).any()
        ])

    # ------------------------------------------------------------------
    def doy_profile(self, var, along: str = "rlat") -> np.ndarray:
        """Mean day-of-year cycle profiled along one spatial axis
        (reference :467-526): (365, H) for along='rlat', (365, W) for 'rlon'."""
        x = self._var(var)
        axis = 2 if along == "rlat" else 1  # average out the OTHER axis
        prof = x.mean(axis=axis)            # (T, H) or (T, W)
        out = np.zeros((365, prof.shape[1]), prof.dtype)
        for d in range(365):
            sel = self.doy == d
            if sel.any():
                out[d] = prof[sel].mean(axis=0)
        return out

    # ------------------------------------------------------------------
    def spearman_crosscorrelation(self, var, ref_pixel: tuple[int, int]
                                  ) -> np.ndarray:
        """(H, W) Spearman correlation of every pixel's daily series with the
        series at ``ref_pixel`` (reference :543-582)."""
        x = self._var(var)
        rx = _rank(x, axis=0)
        rref = rx[:, ref_pixel[0], ref_pixel[1]][:, None, None]
        return _pearson(rx, np.broadcast_to(rref, rx.shape), axis=0)

    def lagged_autocorrelation(self, var, lags=(1, 2, 3, 5, 10)
                               ) -> dict[int, np.ndarray]:
        """{lag: (H, W)} Spearman autocorrelation of each pixel's series with
        itself shifted by ``lag`` days (reference :585-644)."""
        x = self._var(var)
        out = {}
        for lag in lags:
            a = _rank(x[:-lag], axis=0)
            b = _rank(x[lag:], axis=0)
            out[lag] = _pearson(a, b, axis=0)
        return out
