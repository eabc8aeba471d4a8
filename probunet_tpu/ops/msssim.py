"""SSIM / MS-SSIM in pure JAX (NHWC).

Re-implementation of the subset of ``pytorch_msssim`` the reference depends on
(reference src/prob_unet_utils.py:297 calls
``ms_ssim(pred, target, data_range=..., size_average=True, win_size=7)``),
with matching semantics:

- separable Gaussian window (win_sigma=1.5), VALID padding;
- K = (0.01, 0.03); biased covariance estimates;
- per-level downsampling by 2x2 average pooling with zero padding on odd
  sides (count_include_pad=True semantics);
- default 5-level power weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333];
- relu() on intermediate cs values and the final ssim before the weighted
  geometric mean (pytorch_msssim's NaN guard).

Layout is NHWC (TPU-native); the depthwise Gaussian filter is a grouped
``lax.conv_general_dilated``, which XLA fuses and tiles onto the MXU/VPU.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax

_DEFAULT_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(win_size: int, sigma: float, dtype) -> jax.Array:
    coords = jnp.arange(win_size, dtype=dtype) - win_size // 2
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    return g / g.sum()


def _depthwise_1d(x: jax.Array, win: jax.Array, axis: int) -> jax.Array:
    """Depthwise valid-padding 1-D convolution of (N,H,W,C) along H or W."""
    c = x.shape[-1]
    k = win.shape[0]
    if axis == 1:  # H
        kernel = jnp.tile(win.reshape(k, 1, 1, 1), (1, 1, 1, c))
    else:  # W
        kernel = jnp.tile(win.reshape(1, k, 1, 1), (1, 1, 1, c))
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _gaussian_filter(x: jax.Array, win: jax.Array) -> jax.Array:
    return _depthwise_1d(_depthwise_1d(x, win, axis=1), win, axis=2)


def _avg_pool2_padded(x: jax.Array) -> jax.Array:
    """2x2/stride-2 average pool, zero-padding odd sides, count_include_pad.

    Matches ``F.avg_pool2d(x, kernel_size=2, padding=[s % 2 for s in shape])``
    as used between MS-SSIM levels in pytorch_msssim.
    """
    n, h, w, c = x.shape
    pad_h, pad_w = h % 2, w % 2
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)),
    )
    return summed / 4.0


def _ssim_components(
    x: jax.Array,
    y: jax.Array,
    data_range,
    win: jax.Array,
    k1: float = 0.01,
    k2: float = 0.03,
):
    """Return (ssim_per_channel, cs_per_channel), each of shape (N, C)."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu1 = _gaussian_filter(x, win)
    mu2 = _gaussian_filter(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _gaussian_filter(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter(x * y, win) - mu1_mu2

    cs_map = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map.mean(axis=(1, 2)), cs_map.mean(axis=(1, 2))


def ssim(
    x: jax.Array,
    y: jax.Array,
    data_range,
    win_size: int = 11,
    win_sigma: float = 1.5,
    size_average: bool = True,
) -> jax.Array:
    """Single-scale SSIM over (N, H, W, C) arrays."""
    win = _gaussian_window(win_size, win_sigma, x.dtype)
    s, _ = _ssim_components(x, y, data_range, win)
    s = jax.nn.relu(s)
    return s.mean() if size_average else s.mean(axis=1)


def ms_ssim(
    x: jax.Array,
    y: jax.Array,
    data_range,
    win_size: int = 11,
    win_sigma: float = 1.5,
    weights=_DEFAULT_WEIGHTS,
    size_average: bool = True,
) -> jax.Array:
    """Multi-scale SSIM over (N, H, W, C) arrays.

    Reference call site uses win_size=7 (src/prob_unet_utils.py:297).
    """
    smaller = min(x.shape[1], x.shape[2])
    assert smaller > (win_size - 1) * 2 ** (len(weights) - 1), (
        f"image side {smaller} too small for {len(weights)}-level MS-SSIM with "
        f"win_size={win_size}"
    )
    win = _gaussian_window(win_size, win_sigma, x.dtype)
    weights_arr = jnp.asarray(weights, dtype=x.dtype)

    levels = len(weights)
    vals = []  # cs per level, then ssim at the last level; each (N, C)
    for i in range(levels):
        s, cs = _ssim_components(x, y, data_range, win)
        if i < levels - 1:
            vals.append(jax.nn.relu(cs))
            x = _avg_pool2_padded(x)
            y = _avg_pool2_padded(y)
    vals.append(jax.nn.relu(s))

    stacked = jnp.stack(vals, axis=0)  # (levels, N, C)
    msv = jnp.prod(stacked ** weights_arr.reshape(-1, 1, 1), axis=0)  # (N, C)
    return msv.mean() if size_average else msv.mean(axis=1)
