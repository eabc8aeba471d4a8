"""Non-U-Net downscaling baselines.

- :class:`LinearCNN` — two stacked 3x3 convs, a linear-capacity CNN baseline
  (reference src/baseline/models.py:28-62; its time-embedding MLP is dead
  code there and omitted here);
- :func:`bcsd` — Bias-Corrected Statistical Downscaling: scale the
  interpolated LR field by the training-set day-of-year HR/LR-interp
  climatology ratio (reference src/baseline/models.py:10-26).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class LinearCNN(nn.Module):
    in_channels: int
    latent_channels: int = 10
    dtype: Any = None

    @nn.compact
    def __call__(self, x, t=None, train: bool = False):
        x = nn.Conv(
            self.latent_channels, (3, 3), padding="SAME", dtype=self.dtype,
            name="first_conv",
        )(x)
        return nn.Conv(
            self.in_channels, (3, 3), padding="SAME", dtype=self.dtype,
            name="second_conv",
        )(x)


def bcsd(
    train_hr: np.ndarray,
    train_lrinterp: np.ndarray,
    test_lrinterp: np.ndarray,
    epsilon: float = 1e-9,
    days_per_year: int = 365,
) -> jnp.ndarray:
    """BCSD baseline (reference src/baseline/models.py:10-26).

    train_hr / train_lrinterp: (T_train, H, W, C) training fields (HR ground
    truth and its interpolated LR version); test_lrinterp: (T_test, H, W, C).
    For each day-of-year d, scale test lrinterp by
      mean_{train years}(HR | doy=d) / (lrinterp | doy=d)
    following the reference's climatology-numerator / per-year-denominator
    construction. The number of scaling years is the min of train/test years
    (reference src/baseline/models.py:12-13).
    """
    t_train = train_hr.shape[0]
    t_test = test_lrinterp.shape[0]
    train_years = t_train // days_per_year
    test_years = t_test // days_per_year
    scaling_years = min(train_years, test_years)
    n = scaling_years * days_per_year

    hr = jnp.asarray(train_hr[-n:])
    den = jnp.asarray(train_lrinterp[-n:])

    # day-of-year climatology mean of HR over the scaling years
    hr_by_doy = hr.reshape(scaling_years, days_per_year, *hr.shape[1:])
    clim = hr_by_doy.mean(axis=0)  # (365, H, W, C)
    # numerator repeated over years; denominator regrouped by day-of-year
    num = jnp.tile(clim, (scaling_years, 1, 1, 1))
    den_by_doy = den.reshape(scaling_years, days_per_year, *den.shape[1:])
    den_regrouped = jnp.swapaxes(den_by_doy, 0, 1).reshape(n, *den.shape[1:])

    scale = num / (den_regrouped + epsilon)  # (n, H, W, C)
    test = jnp.asarray(test_lrinterp[: scale.shape[0]])
    return test * scale[: test.shape[0]]
