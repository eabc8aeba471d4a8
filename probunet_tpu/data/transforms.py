"""Physical variable transforms.

JAX re-implementations of the unit conversions and positivity transforms in
reference src/climex_utils.py:32-50, applied at src/climex_utils.py:136-138:

- precipitation is stored as ``softplus_inv(pr)`` so decoded predictions stay
  positive after ``softplus``;
- tasmax is stored as ``softplus_inv(tasmax - tasmin, c=0)`` so the decoded
  tasmax always exceeds tasmin.

The reference implements these with in-place masked torch ops; here they are
pure functions using ``jnp.where`` (branch-free, fusable by XLA).
"""

from __future__ import annotations

import jax.numpy as jnp


def kgm2s_to_mmday(x):
    """kg/m^2/s -> mm/day (reference src/climex_utils.py:32-33)."""
    return x * 86400.0


def k_to_c(x):
    """Kelvin -> Celsius (reference src/climex_utils.py:49-50)."""
    return x - 273.15


def softplus_inv(x, threshold: float = 20.0, c: float = 1e-7):
    """Inverse softplus: y = log(exp(x + c) - 1), identity above `threshold`.

    Matches reference src/climex_utils.py:36-40 exactly (including the `c`
    shift being applied inside the exponent).
    """
    x = jnp.asarray(x)
    safe = jnp.where(x > threshold, 1.0, x)  # avoid overflow in exp
    inv = jnp.log(jnp.expm1(safe + c))
    return jnp.where(x > threshold, x, inv)


def softplus(x, threshold: float = 20.0, c: float = 1e-7):
    """Softplus: y = log(exp(x) + 1) - c, identity above `threshold`.

    Matches reference src/climex_utils.py:42-46.
    """
    x = jnp.asarray(x)
    safe = jnp.where(x > threshold, 0.0, x)
    sp = jnp.log1p(jnp.exp(safe)) - c
    return jnp.where(x > threshold, x, sp)


def apply_physical_transform(hr, variables=("pr", "tasmin", "tasmax")):
    """Apply the storage-space transforms to an (T, H, W, C) stack.

    Channel order must be (pr, tasmin, tasmax) as in the reference
    (src/climex_utils.py:136-138). For single-variable ("pr",) stacks only the
    softplus-inverse on pr applies. Input is NHWC (TPU-native layout).
    """
    variables = tuple(variables)
    chans = []
    for i, v in enumerate(variables):
        x = hr[..., i]
        if v == "pr":
            x = softplus_inv(x)
        elif v == "tasmax" and "tasmin" in variables:
            j = variables.index("tasmin")
            x = softplus_inv(hr[..., i] - hr[..., j], c=0.0)
        chans.append(x)
    return jnp.stack(chans, axis=-1)


def invert_physical_transform(x, variables=("pr", "tasmin", "tasmax")):
    """Invert :func:`apply_physical_transform` back to physical units.

    Mirrors the notebook-side inversion (reference
    src/notebooks/results.ipynb cell 2 ``invert_transfo_3vars``):
    pr = softplus(stored_pr); tasmax = tasmin + softplus(stored_delta, c=0).
    """
    variables = tuple(variables)
    chans = {}
    for i, v in enumerate(variables):
        chans[v] = x[..., i]
    out = []
    for i, v in enumerate(variables):
        if v == "pr":
            out.append(softplus(chans["pr"]))
        elif v == "tasmax" and "tasmin" in variables:
            out.append(chans["tasmin"] + softplus(chans["tasmax"], c=0.0))
        else:
            out.append(chans[v])
    return jnp.stack(out, axis=-1)


def date_to_float(time_index):
    """np.datetime64 array -> float64 ns-since-epoch (src/climex_utils.py:21-22)."""
    import numpy as np

    return np.asarray(time_index).astype("datetime64[ns]").astype(float)


def float_to_date(t):
    """Inverse of :func:`date_to_float` (src/climex_utils.py:27-29)."""
    import numpy as np

    return np.datetime64(int(t), "ns")


def cyclic_time_features(month, day):
    """sin/cos cyclic encoding summed as in reference src/climex_utils.py:117-119.

    timestamps = sin(2*pi*month/12) + cos(2*pi*day/31)
    """
    import numpy as np

    return np.sin(2 * np.pi * np.asarray(month) / 12.0) + np.cos(
        2 * np.pi * np.asarray(day) / 31.0
    )
