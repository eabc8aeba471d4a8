"""Small training utilities (reference src/prob_unet_utils.py:26-43)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def l2_regularization(params) -> jax.Array:
    """Sum of squared parameters (reference ``l2_regularisation``,
    src/prob_unet_utils.py:26-33). Provided for explicit-penalty
    experiments; the default optimizer applies decoupled AdamW decay
    instead (train.state.make_optimizer)."""
    return sum(jnp.sum(p * p) for p in jax.tree.leaves(params))


def moving_average(values, window: int = 20) -> np.ndarray:
    """Simple trailing moving average for loss-curve smoothing
    (reference ``moving_average``, src/prob_unet_utils.py:36-43, used by the
    deterministic driver's loss plots at
    src/deterministic_unet_main.py:94-108)."""
    v = np.asarray(values, dtype=np.float64)
    if v.size < window:
        return v.copy()
    c = np.cumsum(np.insert(v, 0, 0.0))
    return (c[window:] - c[:-window]) / window
