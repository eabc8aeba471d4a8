"""Radially-averaged power spectral density (PSD).

TPU-native port of the ``psd`` / ``compute_psd_tensor`` analysis in the
reference's results notebook (reference src/notebooks/results.ipynb cell 4):
2-D FFT power spectrum of each field, azimuthally averaged over integer
wavenumber bins. The reference loops per-sample in torch on GPU; here one
jitted jnp.fft pass handles the whole (T, H, W, C) stack, and the
azimuthal average is a segment-sum over precomputed static bins.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _radial_bins(h: int, w: int) -> tuple[np.ndarray, int]:
    """Integer radial wavenumber of each (ky, kx) FFT cell, and #bins."""
    fy = np.fft.fftfreq(h) * h
    fx = np.fft.fftfreq(w) * w
    r = np.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)
    bins = np.round(r).astype(np.int32)
    nbins = int(bins.max()) + 1
    return bins, nbins


@partial(jax.jit, static_argnames=("nbins",))
def _psd_impl(fields: jax.Array, bins: jax.Array, nbins: int) -> jax.Array:
    power = jnp.abs(jnp.fft.fft2(fields, axes=(-3, -2))) ** 2  # (..., H, W, C)
    flat = power.reshape(power.shape[:-3] + (-1, power.shape[-1]))
    binsf = bins.reshape(-1)
    sums = jax.ops.segment_sum(
        jnp.moveaxis(flat, -2, 0), binsf, num_segments=nbins
    )  # (nbins, ..., C)
    counts = jax.ops.segment_sum(
        jnp.ones_like(binsf, flat.dtype), binsf, num_segments=nbins
    )
    mean = sums / counts.reshape((nbins,) + (1,) * (sums.ndim - 1))
    return jnp.moveaxis(mean, 0, -2)  # (..., nbins, C)


def psd(fields) -> jax.Array:
    """Azimuthally-averaged PSD.

    fields: (..., H, W, C) -> (..., k, C) with k = max integer wavenumber+1.
    Typically called with (T, H, W, C) to get per-day spectra; average over
    the leading axis for the dataset-mean spectrum the notebook plots.
    """
    fields = jnp.asarray(fields)
    h, w = fields.shape[-3], fields.shape[-2]
    bins, nbins = _radial_bins(h, w)
    return _psd_impl(fields, jnp.asarray(bins), nbins)


def psd_over_dataset(fields) -> jax.Array:
    """Dataset-mean radially-averaged PSD: (T, H, W, C) -> (k, C).

    The GT-vs-model PSD and ratio plots (results.ipynb cells 8-10) are
    ``psd_over_dataset(model) / psd_over_dataset(gt)`` per variable.
    """
    return psd(fields).mean(axis=0)
