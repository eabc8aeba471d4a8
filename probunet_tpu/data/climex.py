"""ClimEx dataset: ingest, standardization, and the four pipeline types.

TPU-native redesign of ``climex2torch`` (reference src/climex_utils.py:54-285).
Key differences from the reference, by design:

- **Device-side preprocessing.** The reference runs AvgPool + interpolate on
  the host per item per epoch (src/climex_utils.py:157,202-204) — its data
  pipeline alone runs at ~5.8 batches/s (BASELINE.md). Here only the raw HR
  window is transferred to the device; pooling, upsampling, standardization
  and residual construction happen inside the jitted step
  (:func:`preprocess_batch` is pure jnp and fuses into the train step).
- **Eager, explicit statistics.** The reference computes standardization
  stats lazily on the first ``__getitem__`` (src/climex_utils.py:209-211);
  here they are an explicit :class:`Standardization` artifact computed at
  construction and saveable for inference-time reuse.
- **NHWC layout** (TPU conv layout), channels ordered as ``variables``.
- Semantics preserved exactly: LR = AvgPool(k)(HR); LR stats lifted to HR by
  repeat_interleave (src/climex_utils.py:255-264); std uses ddof=1 (torch
  ``Tensor.std`` default); upsampling defaults to NEAREST because the
  reference's ``interpolate`` calls pass no mode (src/climex_utils.py:204).
"""

from __future__ import annotations

import glob as _glob
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.data import transforms
from probunet_tpu.data.synthetic import synthetic_climex_fields, synthetic_timestamps
from probunet_tpu.ops.resample import avg_pool, repeat_interleave_2d, upsample

PIPELINE_TYPES = (
    "lr_to_hr",
    "lr_to_residuals",
    "lrinterp_to_residuals",
    "lrinterp_to_hr",
)


STANDARDIZATION_MODES = ("perpixel", "none", "pertimestep", "minmax")


class Standardization(NamedTuple):
    """Per-pixel standardization statistics (a pytree — passes through jit).

    lr_mean/lr_std: (h, w, C) stats of the avg-pooled LR fields over time;
    hr_mean/hr_std: the same stats lifted to the HR grid by repeat_interleave
    (reference src/climex_utils.py:255-264). min/max support the baseline
    stack's "minmax" mode (reference src/baseline/climex_utils.py:168-195).
    """

    lr_mean: jax.Array
    lr_std: jax.Array
    hr_mean: jax.Array
    hr_std: jax.Array
    lr_min: jax.Array | None = None
    lr_max: jax.Array | None = None
    hr_min: jax.Array | None = None
    hr_max: jax.Array | None = None


def compute_stats(hr: jax.Array, lowres_scale: int) -> Standardization:
    """Time-mean/std (and min/max) of the pooled LR stack, lifted to HR by
    pixel repetition.

    Matches reference ``compute_stats`` (src/climex_utils.py:255-264):
    ``lr.std(dim=0)`` in torch is the UNBIASED (ddof=1) std.
    """
    lr = avg_pool(hr, lowres_scale)  # (T, h, w, C)
    lr_mean = lr.mean(axis=0)
    lr_std = lr.std(axis=0, ddof=1)
    lr_min = lr.min(axis=0)
    lr_max = lr.max(axis=0)
    lift = lambda a: repeat_interleave_2d(a, lowres_scale)  # noqa: E731
    return Standardization(
        lr_mean=lr_mean,
        lr_std=lr_std,
        hr_mean=lift(lr_mean),
        hr_std=lift(lr_std),
        lr_min=lr_min,
        lr_max=lr_max,
        hr_min=lift(lr_min),
        hr_max=lift(lr_max),
    )


def standardize(
    x: jax.Array,
    mean: jax.Array | None,
    std: jax.Array | None,
    mn: jax.Array | None,
    mx: jax.Array | None,
    mode: str,
    epsilon: float,
) -> jax.Array:
    """Apply one of the four standardization modes
    (reference src/baseline/climex_utils.py:140-153):
    perpixel (time stats per pixel), none, pertimestep (each sample's own
    spatial mean/std), minmax (per-pixel range scaling)."""
    if mode == "none":
        return x
    if mode == "perpixel":
        return (x - mean) / (std + epsilon)
    if mode == "pertimestep":
        m = x.mean(axis=(1, 2), keepdims=True)
        s = x.std(axis=(1, 2), keepdims=True)
        return (x - m) / (s + epsilon)
    if mode == "minmax":
        return (x - mn) / (mx - mn + epsilon)
    raise ValueError(f"unknown standardization {mode!r}")


def preprocess_batch(
    hr: jax.Array,
    stats: Standardization,
    pipeline: str,
    lowres_scale: int,
    interp_mode: str = "nearest",
    epsilon: float = 1e-10,
    standardization: str = "perpixel",
) -> dict[str, jax.Array]:
    """Raw HR batch (B, H, W, C) -> model inputs/targets + diagnostics.

    Pure function of static (pipeline, lowres_scale, interp_mode,
    standardization); safe to close over inside a jitted train step.
    Reproduces the four per-item branches of the reference ``__getitem__``
    (src/climex_utils.py:152-251); ``standardization`` adds the baseline
    stack's selectable modes (src/baseline/climex_utils.py:140-153), with
    "perpixel" (LR time stats lifted to HR) being the current stack's
    behavior. With "pertimestep" the per-item (mean, std) of the HR field is
    returned as ``stand_stats`` — the analog of the reference's per-item
    stats needed to invert residuals (src/baseline/climex_utils.py:168-195).
    """
    if pipeline not in PIPELINE_TYPES:
        raise ValueError(f"unknown pipeline {pipeline!r}")
    k = lowres_scale
    lr = avg_pool(hr, k)

    st = lambda x, mean, std, mn, mx: standardize(  # noqa: E731
        x, mean, std, mn, mx, standardization, epsilon
    )
    lr_stand = st(lr, stats.lr_mean, stats.lr_std, stats.lr_min, stats.lr_max)

    out = {"hr": hr, "lr": lr}
    item_stats = None
    if standardization == "pertimestep":
        # ONE set of per-item stats (the HR field's) standardizes both the
        # HR target and the lrinterp baseline, so residuals invert exactly;
        # these are the per-item ``stand_stats`` the reference hands back
        # for inversion (src/baseline/climex_utils.py:168-195)
        item_stats = {
            "mean": hr.mean(axis=(1, 2), keepdims=True),
            "std": hr.std(axis=(1, 2), keepdims=True),
        }
        out["stand_stats"] = item_stats
        hr_stand = (hr - item_stats["mean"]) / (item_stats["std"] + epsilon)
    else:
        hr_stand = st(hr, stats.hr_mean, stats.hr_std, stats.hr_min,
                      stats.hr_max)

    if pipeline == "lr_to_hr":
        return {"inputs": lr_stand, "targets": hr_stand, **out}

    lrinterp = upsample(lr, k, interp_mode)
    out["lrinterp"] = lrinterp
    if pipeline == "lr_to_residuals":
        lr_stand_up = upsample(lr_stand, k, interp_mode)
        residual = hr_stand - lr_stand_up
        return {"inputs": lr_stand, "targets": residual, **out}

    if standardization == "pertimestep":
        lrinterp_stand = (lrinterp - item_stats["mean"]) / (
            item_stats["std"] + epsilon
        )
    else:
        lrinterp_stand = st(
            lrinterp, stats.hr_mean, stats.hr_std, stats.hr_min, stats.hr_max
        )
    if pipeline == "lrinterp_to_residuals":
        residual = hr_stand - lrinterp_stand
        return {"inputs": lrinterp_stand, "targets": residual, **out}

    # lrinterp_to_hr
    return {"inputs": lrinterp_stand, "targets": hr_stand, **out}


def lrinterp_from_batch(
    batch: dict[str, jax.Array], lowres_scale: int, interp_mode: str = "nearest"
) -> jax.Array:
    """The interpolated-LR baseline field for ANY pipeline's batch dict.

    ``preprocess_batch`` only includes "lrinterp" for pipelines that consume
    it (lr_to_hr returns just inputs/targets/hr/lr); samplers and evaluators
    that reconstruct HR = lrinterp + residual must not KeyError on the other
    pipelines — compute it from the LR field when absent.
    """
    if "lrinterp" in batch:
        return batch["lrinterp"]
    return upsample(batch["lr"], lowres_scale, interp_mode)


def invstand_residual(
    residual: jax.Array,
    stats: Standardization,
    pipeline: str,
    epsilon: float = 1e-10,
    standardization: str = "perpixel",
    item_stats: dict | None = None,
) -> jax.Array:
    """Invert standardization of a model output
    (reference src/climex_utils.py:277-281; mode variants
    src/baseline/climex_utils.py:208-212). ``item_stats`` is the
    ``stand_stats`` dict from :func:`preprocess_batch` — required for the
    "pertimestep" mode."""
    to_hr = pipeline in ("lr_to_hr", "lrinterp_to_hr")
    if standardization == "none":
        return residual
    if standardization == "perpixel":
        scaled = residual * (stats.hr_std + epsilon)
        return scaled + stats.hr_mean if to_hr else scaled
    if standardization == "minmax":
        scaled = residual * (stats.hr_max - stats.hr_min + epsilon)
        return scaled + stats.hr_min if to_hr else scaled
    if standardization == "pertimestep":
        if item_stats is None:
            raise ValueError("pertimestep inversion needs item_stats")
        scaled = residual * (item_stats["std"] + epsilon)
        return scaled + item_stats["mean"] if to_hr else scaled
    raise ValueError(f"unknown standardization {standardization!r}")


def residual_to_hr(
    residual: jax.Array,
    lrinterp: jax.Array,
    stats: Standardization,
    pipeline: str = "lrinterp_to_residuals",
    epsilon: float = 1e-10,
    standardization: str = "perpixel",
    item_stats: dict | None = None,
) -> jax.Array:
    """Model output (standardized) -> HR field in storage units.

    For the residual pipelines this is lrinterp + unstandardized residual
    (reference src/climex_utils.py:284-285). For the ``*_to_hr`` pipelines
    the model output IS the standardized HR field — ``invstand_residual``
    already restores the mean, so adding ``lrinterp`` on top would
    double-count the baseline; it is returned as-is.
    """
    inv = invstand_residual(
        residual, stats, pipeline, epsilon, standardization, item_stats
    )
    if pipeline in ("lr_to_hr", "lrinterp_to_hr"):
        return inv
    return lrinterp + inv


def save_packed(path: str, hr: np.ndarray, timestamps=None,
                timestamps_float=None) -> None:
    """Write the packed-array artifact (`probunet_tpu pack` output): one
    .npz with the (T, H, W, C) float32 stack + timestamp features. Replaces
    the reference's per-epoch NetCDF->tensor ingest with a one-time
    conversion (SURVEY.md §7 design mapping, row 1)."""
    np.savez(
        path,
        hr=np.asarray(hr, np.float32),
        timestamps=(np.zeros(len(hr), np.float32)
                    if timestamps is None else np.asarray(timestamps)),
        timestamps_float=(np.zeros(len(hr), np.float64)
                          if timestamps_float is None
                          else np.asarray(timestamps_float)),
    )


def load_packed(path: str):
    """Memory-mapped read of a packed artifact -> (hr, timestamps, ts_float)."""
    if path.endswith(".npy"):
        return np.load(path, mmap_mode="r"), None, None
    z = np.load(path, mmap_mode="r")
    return z["hr"], z["timestamps"], z["timestamps_float"]


class ClimexDataset:
    """In-memory (T, H, W, C) HR stack + stats + batch assembly.

    Sources, in priority order:
      - ``hr`` array passed directly (packed ingest / tests);
      - NetCDF directory via xarray (gated on availability — the reference's
        dask-parallel open_mfdataset path, src/climex_utils.py:93-128);
      - synthetic generator (CI/bench default when no data available).
    """

    def __init__(
        self,
        datadir: str | None = None,
        years=range(1960, 2020),
        variables=("pr", "tasmin", "tasmax"),
        coords=(120, 184, 120, 184),
        pipeline: str = "lr_to_hr",
        lowres_scale: int = 4,
        transfo: bool = False,
        megafile: str | None = None,
        interp_mode: str = "nearest",
        epsilon: float = 1e-10,
        hr: np.ndarray | None = None,
        timestamps: np.ndarray | None = None,
        timestamps_float: np.ndarray | None = None,
        synthetic: bool = False,
        synthetic_seed: int = 0,
        standardization: str = "perpixel",
        pad_to_multiple: bool = False,
        packed: str | None = None,
    ):
        self.variables = tuple(variables)
        self.nvars = len(self.variables)
        self.coords = tuple(coords)
        self.pipeline = pipeline
        self.lowres_scale = int(lowres_scale)
        self.transfo = bool(transfo)
        self.interp_mode = interp_mode
        self.epsilon = float(epsilon)
        if standardization not in STANDARDIZATION_MODES:
            raise ValueError(f"unknown standardization {standardization!r}")
        self.standardization = standardization
        self.years = list(years)

        if packed is not None:
            # packed .npy/.npz produced by `probunet_tpu pack`: memory-mapped,
            # so construction is O(1) and pages stream in as batches are cut
            hr, ts, tsf = load_packed(packed)
            if ts is not None and timestamps is None:
                timestamps, timestamps_float = ts, tsf
            c = self.coords
            hr = np.ascontiguousarray(
                hr[:, c[2]:c[3], c[0]:c[1], :]
                if hr.shape[1] > c[3] - c[2] else hr
            )
        elif hr is not None:
            hr = np.asarray(hr, dtype=np.float32)
        elif synthetic or datadir is None and megafile is None:
            h = self.coords[1] - self.coords[0]
            w = self.coords[3] - self.coords[2]
            num_days = 365 * max(1, len(self.years))
            hr = synthetic_climex_fields(
                num_days, h, w, self.variables, seed=synthetic_seed
            )
        else:
            hr = self._load_netcdf(datadir, megafile)
            if timestamps is None and getattr(
                self, "_netcdf_timestamps", None
            ) is not None:
                # cyclic time features + float timestamps derived from the
                # files' (noleap) time coordinate (src/climex_utils.py:116-120)
                timestamps = self._netcdf_timestamps
                timestamps_float = self._netcdf_timestamps_float

        # geographic coordinates: set by the NetCDF ingest, None otherwise
        self.lat = getattr(self, "lat", None)
        self.lon = getattr(self, "lon", None)

        # optional edge-padding of H/W to pooling multiples — needed for
        # full-domain work (ClimEx 280 is not divisible by scale 16);
        # `orig_shape` records the unpadded grid for cropping results back
        self.orig_shape = hr.shape
        if pad_to_multiple:
            k = self.lowres_scale
            ph = (-hr.shape[1]) % k
            pw = (-hr.shape[2]) % k
            if ph or pw:
                hr = np.pad(hr, ((0, 0), (0, ph), (0, pw), (0, 0)),
                            mode="edge")

        t = hr.shape[0]
        if timestamps is None or timestamps_float is None:
            start = self.years[0] if self.years else 1960
            timestamps, timestamps_float = synthetic_timestamps(t, start_year=start)
        self.timestamps = np.asarray(timestamps, dtype=np.float32)
        self.timestamps_float = np.asarray(timestamps_float, dtype=np.float64)

        # Physical transforms into storage space (src/climex_utils.py:136-138).
        # jitted: one compiled program instead of per-op eager dispatches
        # (pathological over remote-device links)
        if self.transfo:
            transfo_fn = jax.jit(
                lambda a: transforms.apply_physical_transform(a, self.variables)
            )
            hr = np.asarray(transfo_fn(hr))
        self.hr = hr  # (T, H, W, C), storage space, float32, host memory

        # Standardization stats: explicit artifact (see module docstring), jitted
        stats_fn = jax.jit(lambda a: compute_stats(a, self.lowres_scale))
        self.stats: Standardization = jax.tree.map(np.asarray, stats_fn(hr))

    # ------------------------------------------------------------------
    def _load_netcdf(self, datadir: str | None, megafile: str | None) -> np.ndarray:
        try:
            import xarray as xr
        except ImportError as e:
            raise ImportError(
                "xarray is required for NetCDF ingest; pass hr= directly, use "
                "synthetic=True, or install xarray/h5netcdf"
            ) from e

        c = self.coords

        def select_coords(ds):
            return ds.isel(rlon=slice(c[0], c[1]), rlat=slice(c[2], c[3]))

        if megafile is None:
            files = []
            for year in self.years:
                for var in self.variables:
                    matches = _glob.glob(f"{datadir}/*_{var}_*_{year}_*")
                    if not matches:
                        raise FileNotFoundError(
                            f"no NetCDF file for var={var} year={year} in {datadir}"
                        )
                    files.append(matches[0])
            data = xr.open_mfdataset(
                paths=files,
                engine="h5netcdf",
                preprocess=select_coords,
                data_vars="minimal",
                coords="minimal",
                compat="override",
                parallel=False,
            )[list(self.variables)]
        else:
            data = xr.open_dataset(megafile, engine="h5netcdf")[list(self.variables)]

        # 2-D geographic coordinates for geo-referenced map plotting
        # (reference src/climex_utils.py:354-363 pcolormesh(lon, lat, ...))
        self.lon = (np.asarray(data["lon"]) if "lon" in getattr(
            data, "variables", {}) else None)
        self.lat = (np.asarray(data["lat"]) if "lat" in getattr(
            data, "variables", {}) else None)
        try:
            time = data.indexes["time"].to_datetimeindex()
            month = np.sin(2 * np.pi * time.month / 12)
            day = np.cos(2 * np.pi * time.day / 31)
            self._netcdf_timestamps = np.asarray(month + day, dtype=np.float32)
            self._netcdf_timestamps_float = transforms.date_to_float(time)
        except Exception as e:
            import warnings

            warnings.warn(
                f"NetCDF time coordinate could not be converted "
                f"({type(e).__name__}: {e}); falling back to synthetic "
                f"timestamps", stacklevel=2,
            )
            self._netcdf_timestamps = None

        drop = [v for v in ("lat", "lon") if v in data.variables]
        arr = data.drop_vars(drop).to_array()  # (var, time, rlat, rlon)
        arr = arr.transpose("time", "rlat", "rlon", "variable")
        return np.asarray(arr.to_numpy(), dtype=np.float32)

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return self.hr.shape[0]

    def get_hr_batch(self, idx: np.ndarray) -> np.ndarray:
        """Raw HR slice (host memory) for a batch of time indices."""
        return self.hr[np.asarray(idx)]

    def preprocess(self, hr_batch: jax.Array) -> dict[str, jax.Array]:
        """Device-side batch preprocessing (jit-safe; see preprocess_batch)."""
        return preprocess_batch(
            hr_batch,
            jax.tree.map(jnp.asarray, self.stats),
            self.pipeline,
            self.lowres_scale,
            self.interp_mode,
            self.epsilon,
            self.standardization,
        )

    def batch(self, idx: np.ndarray) -> dict[str, jax.Array]:
        """Full item dict for a batch of indices, mirroring the reference's
        ``__getitem__`` keys (inputs/targets/timestamps/timestamps_float/
        hr/lr[/lrinterp], src/climex_utils.py:152-251)."""
        idx = np.asarray(idx)
        out = self.preprocess(jnp.asarray(self.get_hr_batch(idx)))
        out["timestamps"] = jnp.asarray(self.timestamps[idx])
        out["timestamps_float"] = self.timestamps_float[idx]
        return out

    def invstand_residual(self, residual, item_stats=None):
        return invstand_residual(
            residual, jax.tree.map(jnp.asarray, self.stats), self.pipeline,
            self.epsilon, self.standardization, item_stats,
        )

    def residual_to_hr(self, residual, lrinterp, item_stats=None):
        return residual_to_hr(
            residual,
            lrinterp,
            jax.tree.map(jnp.asarray, self.stats),
            self.pipeline,
            self.epsilon,
            self.standardization,
            item_stats,
        )
