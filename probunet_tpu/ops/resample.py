"""Spatial resampling primitives (NHWC, TPU-friendly).

Device-side replacements for the per-item CPU ``nn.AvgPool2d`` /
``nn.functional.interpolate`` calls in the reference data pipeline
(reference src/climex_utils.py:157,187,202-204,232-233). The reference runs
these on host per `__getitem__` per epoch; here they are pure jnp functions
that fuse into the jitted step or run once at ingest.

All functions take ``(..., H, W, C)`` arrays — channels-last, the native TPU
conv layout — and integer resampling factors (static shapes only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def avg_pool(x: jax.Array, k: int) -> jax.Array:
    """Non-overlapping k x k average pooling over the (-3, -2) spatial axes.

    Equivalent to ``nn.AvgPool2d(kernel_size=k)`` (reference
    src/climex_utils.py:157). Implemented as a reshape-mean, which XLA lowers
    to a single fused reduction (no window scan).
    """
    if k == 1:
        return x
    *lead, h, w, c = x.shape
    assert h % k == 0 and w % k == 0, f"spatial dims {(h, w)} not divisible by {k}"
    x = x.reshape(*lead, h // k, k, w // k, k, c)
    return x.mean(axis=(-4, -2))


def upsample_nearest(x: jax.Array, k: int) -> jax.Array:
    """Nearest-neighbor k-times upsampling over the (-3, -2) spatial axes.

    Matches ``nn.functional.interpolate(scale_factor=k)`` with torch's
    DEFAULT mode='nearest' — which is what the reference's current pipeline
    actually calls at src/climex_utils.py:187,204,233 (no mode kwarg).
    """
    if k == 1:
        return x
    x = jnp.repeat(x, k, axis=-3)
    x = jnp.repeat(x, k, axis=-2)
    return x


def upsample_bilinear(x: jax.Array, k: int) -> jax.Array:
    """Bilinear k-times upsampling (half-pixel centers, torch align_corners=False).

    Matches the baseline stack's explicit bilinear interpolate
    (reference src/baseline/climex_utils.py). Uses ``jax.image.resize``
    ('linear' = half-pixel-center bilinear).
    """
    if k == 1:
        return x
    *lead, h, w, c = x.shape
    out_shape = (*lead, h * k, w * k, c)
    return jax.image.resize(x, out_shape, method="linear")


def upsample(x: jax.Array, k: int, mode: str = "nearest") -> jax.Array:
    if mode == "nearest":
        return upsample_nearest(x, k)
    if mode == "bilinear":
        return upsample_bilinear(x, k)
    raise ValueError(f"unknown upsample mode {mode!r}")


def repeat_interleave_2d(x: jax.Array, k: int) -> jax.Array:
    """Repeat each spatial pixel k times along both H and W axes of (H, W, C).

    Equivalent to the double ``repeat_interleave`` used to lift LR statistics
    to the HR grid (reference src/climex_utils.py:261-262). Identical to
    nearest upsampling; kept as a named alias for parity readability.
    """
    return upsample_nearest(x, k)
