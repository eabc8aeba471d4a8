"""Synthetic ClimEx-like field generator.

The reference has no test fixtures at all (no tests/ directory — see
SURVEY.md §4); its data comes from private NetCDF files. This module
generates spatially-correlated daily fields with the same statistical
personality as the ClimEx variables (pr / tasmin / tasmax on a HR grid) so
that the full pipeline — standardization, residual construction, training,
evaluation, GEV extremes — runs hermetically in CI and benchmarks.

Fields are synthesized as band-limited Fourier noise (smooth spatial
structure) plus a seasonal cycle; ``pr`` is made nonnegative and heavy-tailed
via exponentiation, temperatures are Gaussian-ish with tasmax > tasmin by
construction.
"""

from __future__ import annotations

import numpy as np


def _smooth_noise(rng: np.random.Generator, t: int, h: int, w: int,
                  corr_len: float = 8.0) -> np.ndarray:
    """(T, H, W) spatially-smooth unit-variance noise via FFT filtering."""
    white = rng.standard_normal((t, h, w))
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    # Gaussian low-pass with spatial correlation length `corr_len` pixels
    filt = np.exp(-0.5 * ((fy * corr_len) ** 2 + (fx * corr_len) ** 2) * (2 * np.pi) ** 2)
    spec = np.fft.fft2(white, axes=(1, 2)) * filt[None]
    out = np.fft.ifft2(spec, axes=(1, 2)).real
    std = out.std()
    return out / (std + 1e-12)


def synthetic_climex_fields(
    num_days: int,
    height: int = 128,
    width: int = 128,
    variables=("pr", "tasmin", "tasmax"),
    seed: int = 0,
    dtype=np.float32,
) -> np.ndarray:
    """Generate a (T, H, W, C) stack of daily HR fields in physical units.

    pr      mm/day, >= 0, skewed, occasional extremes;
    tasmin  deg C with an annual cycle and synoptic noise;
    tasmax  tasmin + positive diurnal range.
    """
    rng = np.random.default_rng(seed)
    t = num_days
    day = np.arange(t)
    season = np.sin(2 * np.pi * (day % 365) / 365.0)  # (T,)

    fields = {}
    if "pr" in variables or True:
        z = _smooth_noise(rng, t, height, width, corr_len=6.0)
        intensity = 1.2 + 0.8 * season[:, None, None]
        # lognormal-ish precipitation; dry days where z below threshold
        pr = np.exp(1.1 * z + 0.3 * _smooth_noise(rng, t, height, width, 20.0)) * intensity
        pr = np.where(z > -0.2, pr, 0.0) * 4.0
        fields["pr"] = pr

    base = 8.0 * season[:, None, None] + 4.0 * _smooth_noise(rng, t, height, width, 24.0)
    # stable spatial gradient (latitude-like)
    grad = np.linspace(-4.0, 4.0, height)[None, :, None]
    tasmin = base + grad + 1.5 * _smooth_noise(rng, t, height, width, 10.0) + 2.0
    diurnal = 6.0 + 2.0 * np.abs(_smooth_noise(rng, t, height, width, 16.0))
    fields["tasmin"] = tasmin
    fields["tasmax"] = tasmin + diurnal

    out = np.stack([fields[v] for v in variables], axis=-1).astype(dtype)
    return out


def synthetic_climex_fields_device(
    num_days: int,
    height: int = 128,
    width: int = 128,
    variables=("pr", "tasmin", "tasmax"),
    seed: int = 0,
):
    """Device-side jnp twin of :func:`synthetic_climex_fields`.

    Generates the whole (T, H, W, C) stack ON the accelerator inside one
    jitted program — no host->device transfer of the data itself (essential
    for benchmarking on remote-attached TPUs where host link bandwidth is
    orders of magnitude below HBM).
    """
    import jax
    import jax.numpy as jnp

    def smooth(key, corr_len):
        white = jax.random.normal(key, (num_days, height, width))
        fy = jnp.fft.fftfreq(height)[:, None]
        fx = jnp.fft.fftfreq(width)[None, :]
        filt = jnp.exp(
            -0.5 * ((fy * corr_len) ** 2 + (fx * corr_len) ** 2)
            * (2 * jnp.pi) ** 2
        )
        spec = jnp.fft.fft2(white, axes=(1, 2)) * filt[None]
        out = jnp.fft.ifft2(spec, axes=(1, 2)).real
        return out / (out.std() + 1e-12)

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 5)
        day = jnp.arange(num_days)
        season = jnp.sin(2 * jnp.pi * (day % 365) / 365.0)
        z = smooth(ks[0], 6.0)
        intensity = 1.2 + 0.8 * season[:, None, None]
        pr = jnp.exp(1.1 * z + 0.3 * smooth(ks[1], 20.0)) * intensity
        pr = jnp.where(z > -0.2, pr, 0.0) * 4.0
        base = 8.0 * season[:, None, None] + 4.0 * smooth(ks[2], 24.0)
        grad = jnp.linspace(-4.0, 4.0, height)[None, :, None]
        tasmin = base + grad + 1.5 * smooth(ks[3], 10.0) + 2.0
        diurnal = 6.0 + 2.0 * jnp.abs(smooth(ks[4], 16.0))
        fields = {"pr": pr, "tasmin": tasmin, "tasmax": tasmin + diurnal}
        return jnp.stack([fields[v] for v in variables], axis=-1).astype(
            jnp.float32
        )

    return gen(jax.random.key(seed))


def synthetic_timestamps(num_days: int, start_year: int = 1960):
    """(timestamps, timestamps_float) mimicking the reference's cyclic time
    features over a 365-day (noleap) calendar (reference
    src/climex_utils.py:116-120)."""
    day_of_year = np.arange(num_days) % 365
    month = day_of_year // 31 + 1
    day = day_of_year % 31 + 1
    ts = np.sin(2 * np.pi * month / 12.0) + np.cos(2 * np.pi * day / 31.0)
    # float ns timestamps starting at start_year (approximate epoch offset)
    ns_per_day = 86400e9
    epoch_start = (start_year - 1970) * 365.25 * ns_per_day
    ts_float = epoch_start + np.arange(num_days) * ns_per_day
    return ts.astype(np.float32), ts_float.astype(np.float64)
