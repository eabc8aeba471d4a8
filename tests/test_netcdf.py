"""NetCDF ingest path (`ClimexDataset._load_netcdf`) exercised end to end.

xarray is not installed in this environment, so these tests inject a small
fake `xarray` module that reads .npz files while reproducing the exact API
surface the ingest uses (open_mfdataset with per-file preprocess, isel
cropping, variable selection/ordering, a noleap time index with
``to_datetimeindex()``, drop_vars, to_array().transpose(...)) — the same
interaction the reference performs at src/climex_utils.py:99-128. The fake
verifies OUR call pattern: wrong kwargs, wrong dim names or wrong transpose
orders fail these tests.
"""

import glob
import os
import sys
import types

import numpy as np
import pytest

from probunet_tpu.data.climex import ClimexDataset, load_packed, save_packed

RLAT, RLON = 12, 16  # pooling-divisible full grid (lowres_scale 4)
DAYS = 365  # noleap calendar


# ---------------------------------------------------------------------------
# fake xarray
# ---------------------------------------------------------------------------

class _FakeDatetimeIndex:
    """Result of CFTimeIndex.to_datetimeindex(): month/day accessors +
    convertibility to datetime64 (what date_to_float needs)."""

    def __init__(self, dt64):
        self._dt = np.asarray(dt64, dtype="datetime64[ns]")
        days = self._dt.astype("datetime64[D]")
        months = days.astype("datetime64[M]")
        years = days.astype("datetime64[Y]")
        self.month = (months - years).astype(int) + 1
        self.day = (days - months).astype(int) + 1

    def __array__(self, dtype=None):
        return self._dt if dtype is None else self._dt.astype(dtype)

    def __len__(self):
        return len(self._dt)


class _FakeCFTimeIndex:
    def __init__(self, dt64):
        self._dt = dt64

    def to_datetimeindex(self):
        return _FakeDatetimeIndex(self._dt)


class _FakeDataArray:
    def __init__(self, arr, dims):
        self._arr = arr
        self._dims = tuple(dims)

    def transpose(self, *dims):
        perm = [self._dims.index(d) for d in dims]
        return _FakeDataArray(np.transpose(self._arr, perm), dims)

    def to_numpy(self):
        return self._arr


class _FakeDataset:
    def __init__(self, data, time, lat=None, lon=None):
        self._data = dict(data)      # var -> (time, rlat, rlon)
        self._time = np.asarray(time)
        self.lat = lat
        self.lon = lon

    # -- xarray API surface used by _load_netcdf --
    def isel(self, rlon=None, rlat=None):
        def crop(a):
            a = a[:, rlat, :] if rlat is not None else a
            return a[:, :, rlon] if rlon is not None else a

        return _FakeDataset(
            {v: crop(a) for v, a in self._data.items()}, self._time,
            None if self.lat is None else self.lat[rlat, rlon],
            None if self.lon is None else self.lon[rlat, rlon],
        )

    def __getitem__(self, variables):
        if isinstance(variables, str):
            # real xarray: string key returns the (coordinate) DataArray
            if variables == "lat" and self.lat is not None:
                return self.lat
            if variables == "lon" and self.lon is not None:
                return self.lon
            return self._data[variables]
        if not isinstance(variables, list):
            raise TypeError("fake xarray expects a list of variable names")
        return _FakeDataset({v: self._data[v] for v in variables},
                            self._time, self.lat, self.lon)

    @property
    def indexes(self):
        return {"time": _FakeCFTimeIndex(self._time)}

    @property
    def variables(self):
        names = dict.fromkeys(self._data)
        if self.lat is not None:
            names["lat"] = None
            names["lon"] = None
        return names

    def drop_vars(self, names):
        keep = {v: a for v, a in self._data.items() if v not in names}
        return _FakeDataset(keep, self._time, None, None)

    def to_array(self):
        arr = np.stack([self._data[v] for v in self._data])  # (var, t, y, x)
        return _FakeDataArray(arr, ("variable", "time", "rlat", "rlon"))


def _dataset_from_npz(path):
    z = np.load(path, allow_pickle=False)
    variables = [k for k in z.files if k not in ("time", "lat", "lon")]
    return _FakeDataset({v: z[v] for v in variables}, z["time"],
                        z["lat"] if "lat" in z.files else None,
                        z["lon"] if "lon" in z.files else None)


def _concat_time(datasets):
    first = datasets[0]
    out = {}
    for v in first._data:
        out[v] = np.concatenate([d._data[v] for d in datasets], axis=0)
    time = np.concatenate([d._time for d in datasets])
    return _FakeDataset(out, time, first.lat, first.lon)


def _merge_vars(datasets):
    data, time = {}, datasets[0]._time
    for d in datasets:
        np.testing.assert_array_equal(d._time, time)
        data.update(d._data)
    return _FakeDataset(data, time, datasets[0].lat, datasets[0].lon)


def _make_fake_xarray():
    mod = types.ModuleType("xarray")

    def open_mfdataset(paths, engine, preprocess, data_vars, coords, compat,
                       parallel):
        assert engine == "h5netcdf"
        per_var = {}
        for p in paths:
            ds = preprocess(_dataset_from_npz(p))
            var = next(iter(ds._data))
            per_var.setdefault(var, []).append(ds)
        merged = _merge_vars([
            _concat_time(sorted(dss, key=lambda d: d._time[0]))
            for dss in per_var.values()
        ])
        return merged

    def open_dataset(path, engine):
        assert engine == "h5netcdf"
        return _dataset_from_npz(path)

    mod.open_mfdataset = open_mfdataset
    mod.open_dataset = open_dataset
    return mod


# ---------------------------------------------------------------------------
# fixtures: tiny "NetCDF" archive on disk
# ---------------------------------------------------------------------------

def _noleap_times(year):
    """365 datetime64 days: the noleap calendar drops Feb 29."""
    days = np.arange(np.datetime64(f"{year}-01-01"),
                     np.datetime64(f"{year + 1}-01-01"))
    days = days[~((days.astype("datetime64[M]") - days.astype("datetime64[Y]")
                   ).astype(int) == 1) | ((days - days.astype("datetime64[M]")
                                           ).astype(int) != 28)]
    return days[:DAYS].astype("datetime64[ns]")


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    root = tmp_path_factory.mktemp("netcdf")
    rng = np.random.default_rng(0)
    lat = np.linspace(40, 50, RLAT)[:, None] + np.zeros((1, RLON))
    lon = np.linspace(-80, -70, RLON)[None, :] + np.zeros((RLAT, 1))
    fields = {}
    for year in (2000, 2001):
        time = _noleap_times(year)
        for var in ("pr", "tasmin"):
            arr = rng.standard_normal((DAYS, RLAT, RLON)).astype(np.float32)
            fields[(year, var)] = arr
            np.savez(root / f"climex_{var}_kda_{year}_xx.npz",
                     **{var: arr}, time=time, lat=lat, lon=lon)
    return str(root), fields


@pytest.fixture()
def fake_xarray(monkeypatch):
    monkeypatch.setitem(sys.modules, "xarray", _make_fake_xarray())


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

COORDS = (3, 11, 2, 10)  # (start_rlon, end_rlon, start_rlat, end_rlat) -> 8x8


def test_load_netcdf_glob_crop_order(archive, fake_xarray):
    root, fields = archive
    ds = ClimexDataset(datadir=root, years=range(2000, 2002),
                       variables=("pr", "tasmin"), coords=COORDS,
                       pipeline="lrinterp_to_residuals", lowres_scale=4,
                       transfo=False)
    c = COORDS
    assert ds.hr.shape == (2 * DAYS, 8, 8, 2)
    # layout (time, rlat, rlon, variable), years concatenated in order,
    # variables in the requested order
    np.testing.assert_allclose(
        ds.hr[0, :, :, 0], fields[(2000, "pr")][0, c[2]:c[3], c[0]:c[1]])
    np.testing.assert_allclose(
        ds.hr[DAYS + 5, :, :, 1],
        fields[(2001, "tasmin")][5, c[2]:c[3], c[0]:c[1]])


def test_load_netcdf_missing_file_raises(archive, fake_xarray):
    root, _ = archive
    with pytest.raises(FileNotFoundError, match="tasmax"):
        ClimexDataset(datadir=root, years=range(2000, 2001),
                      variables=("pr", "tasmax"), coords=COORDS,
                      pipeline="lrinterp_to_residuals", lowres_scale=4,
                      transfo=False)


def test_load_netcdf_noleap_timestamps(archive, fake_xarray):
    """Cyclic time features from the files' time coordinate
    (reference src/climex_utils.py:116-120): sin(2pi*month/12) +
    cos(2pi*day/31), and float64 ns-since-epoch timestamps."""
    root, _ = archive
    ds = ClimexDataset(datadir=root, years=range(2000, 2001),
                       variables=("pr",), coords=COORDS,
                       pipeline="lrinterp_to_residuals", lowres_scale=4,
                       transfo=False)
    assert len(ds.timestamps) == DAYS
    # Jan 1: sin(2pi*1/12) + cos(2pi*1/31)
    expected = np.sin(2 * np.pi / 12) + np.cos(2 * np.pi / 31)
    np.testing.assert_allclose(ds.timestamps[0], expected, rtol=1e-6)
    # noleap: no Feb 29 -> day 59 (0-based) is Mar 1 in year 2000 (a leap
    # year in the real calendar), month feature jumps accordingly
    mar1 = np.sin(2 * np.pi * 3 / 12) + np.cos(2 * np.pi * 1 / 31)
    np.testing.assert_allclose(ds.timestamps[59], mar1, rtol=1e-6)
    # float timestamps round-trip to the actual dates
    from probunet_tpu.data.transforms import float_to_date
    assert float_to_date(ds.timestamps_float[0]) == np.datetime64(
        "2000-01-01", "ns")


def test_load_netcdf_megafile_branch(archive, fake_xarray, tmp_path):
    root, fields = archive
    mega = tmp_path / "megafile.npz"
    time = _noleap_times(2000)
    np.savez(mega, pr=fields[(2000, "pr")], tasmin=fields[(2000, "tasmin")],
             time=time)
    ds = ClimexDataset(megafile=str(mega), years=range(2000, 2001),
                       variables=("pr", "tasmin"), coords=COORDS,
                       pipeline="lrinterp_to_residuals", lowres_scale=4,
                       transfo=False)
    # megafile is pre-cropped upstream: loaded at its full grid
    assert ds.hr.shape == (DAYS, RLAT, RLON, 2)
    np.testing.assert_allclose(ds.hr[3, :, :, 0], fields[(2000, "pr")][3])


def test_pack_roundtrip_from_netcdf(archive, fake_xarray, tmp_path):
    """NetCDF -> pack -> packed load reproduces fields AND time features
    (the L0 -> packed-artifact path of `probunet_tpu pack`)."""
    root, _ = archive
    ds = ClimexDataset(datadir=root, years=range(2000, 2001),
                       variables=("pr", "tasmin"), coords=COORDS,
                       pipeline="lrinterp_to_residuals", lowres_scale=4,
                       transfo=False)
    out = str(tmp_path / "packed.npz")
    save_packed(out, ds.hr, ds.timestamps, ds.timestamps_float)
    ds2 = ClimexDataset(packed=out, variables=("pr", "tasmin"),
                        coords=COORDS, pipeline="lrinterp_to_residuals",
                        lowres_scale=4, transfo=False)
    np.testing.assert_allclose(ds2.hr, ds.hr)
    np.testing.assert_allclose(ds2.timestamps, ds.timestamps)
    np.testing.assert_allclose(ds2.timestamps_float, ds.timestamps_float)


def test_glob_pattern_matches_reference_naming(archive):
    """The file-discovery glob is `*_{var}_*_{year}_*`
    (reference src/climex_utils.py:99)."""
    root, _ = archive
    hits = glob.glob(f"{root}/*_pr_*_2000_*")
    assert len(hits) == 1 and os.path.basename(hits[0]).startswith("climex_pr")
