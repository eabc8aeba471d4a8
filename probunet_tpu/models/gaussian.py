"""Axis-aligned convolutional Gaussian prior/posterior encoder.

Re-design of ``AxisAlignedConvGaussian`` (reference src/prob_unet.py:12-85):
a stack of [MaxPool2x2 +] 3x(conv3x3 + ReLU) per filter level, global average
pooling, and two 1x1 convs producing (mu, log_sigma). Returns a
:class:`~probunet_tpu.ops.distributions.DiagGaussian` pytree instead of a
``torch.distributions`` object, so it flows through jit/vmap/grad.

The posterior variant concatenates the target onto the input channel axis
(reference src/prob_unet.py:66-67). Initialization matches the reference's
``init_weights`` (kaiming-normal fan-in/ReLU weights + truncated-normal(0.001)
biases, reference src/prob_unet_utils.py:18-23).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax
from jax.ad_checkpoint import checkpoint_name

from probunet_tpu.ops.distributions import DiagGaussian


def kaiming_relu_init(key, shape, dtype=jnp.float32):
    """torch ``kaiming_normal_(mode='fan_in', nonlinearity='relu')``:
    std = sqrt(2 / fan_in), fan_in = prod(kernel) * in_channels (HWIO)."""
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    std = (2.0 / fan_in) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


def trunc_normal_bias_init(std: float = 0.001):
    """Truncated normal in (-2, 2) scaled by std
    (reference src/prob_unet_utils.py:10-16,23)."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


class _Conv3x3(nn.Module):
    features: int
    kernel: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.kernel
        w = self.param("weight", kaiming_relu_init, (k, k, cin, self.features))
        b = self.param("bias", trunc_normal_bias_init(), (self.features,))
        dt = self.dtype or x.dtype
        pad = k // 2
        # int8 serving path — same hooks as models/layers.py EDMConv
        from probunet_tpu.ops import quantize as _qz

        _qz.sow_absmax(self, x)
        if self.has_variable("quant", "in_scale"):
            y = _qz.int8_conv(x, w, self.get_variable("quant", "in_scale"),
                              pad)
            return checkpoint_name((y + b).astype(x.dtype), "conv_out")
        y = lax.conv_general_dilated(
            x.astype(dt),
            w.astype(dt),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            # f32 accumulation only when computing in f32: with bf16 operands
            # the MXU accumulates in f32 internally, and requesting an f32
            # output breaks the conv transpose rule (f32 cotangent vs bf16
            # primal dtype mismatch in the vjp)
            preferred_element_type=dt if dt != jnp.float32 else jnp.float32,
        )
        # named for the "save_convs" remat policy (see models/layers.py):
        # under policy remat only conv outputs are stored; the interleaved
        # ReLUs are recomputed in the backward pass. No-op otherwise.
        return checkpoint_name((y + b).astype(x.dtype), "conv_out")


def _max_pool2(x):
    """2x2 stride-2 VALID max pool (reference src/prob_unet.py:33
    ``nn.MaxPool2d(2)``).

    The windows are disjoint, so the pool could be an exact reshape +
    elementwise max whose VJP is a fusable select chain instead of
    ``reduce_window``'s unfusable ``select-and-scatter`` (per-fusion HBM
    table: 1.06 GB/step, both in the prior/posterior backward). That
    variant is kept as ``PROBUNET_MAXPOOL_IMPL=reshape`` but RETIRED as a
    default on measurement (r4 queue 2): 631.9 samples/s / 126.1 GB/step
    vs reduce_window's 637.9 / 122.4 — the strided window slices
    materialize +3.7 GB of layout copies, more than select-and-scatter
    costs. Forward values are bit-identical either way; gradients differ
    only on in-window ties (balanced split vs first-match), which sit on
    the post-ReLU zero plateau where relu' zeroes them anyway."""
    import os

    if os.environ.get("PROBUNET_MAXPOOL_IMPL", "reduce_window") == "reduce_window":
        return lax.reduce_window(
            x,
            -jnp.inf,
            lax.max,
            window_dimensions=(1, 2, 2, 1),
            window_strides=(1, 2, 2, 1),
            padding="VALID",
        )
    b, h, w, c = x.shape
    x = x[:, : h - h % 2, : w - w % 2, :]  # VALID: drop odd trailing row/col
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.maximum(
        jnp.maximum(x[:, :, 0, :, 0], x[:, :, 0, :, 1]),
        jnp.maximum(x[:, :, 1, :, 0], x[:, :, 1, :, 1]),
    )


class AxisAlignedConvGaussian(nn.Module):
    """Conv encoder -> DiagGaussian over the latent axis
    (reference src/prob_unet.py:12-85)."""

    num_filters: Sequence[int]
    latent_dim: int
    posterior: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, target=None) -> DiagGaussian:
        if self.posterior and target is not None:
            x = jnp.concatenate([x, target], axis=-1)
        if self.dtype is not None:
            # compute-dtype residual stream (see models/unet.py rationale);
            # mu/log_sigma are cast back to f32 below
            x = x.astype(self.dtype)

        for i, filters in enumerate(self.num_filters):
            if i != 0:
                x = _max_pool2(x)
            x = nn.relu(_Conv3x3(filters, dtype=self.dtype, name=f"enc{i}_conv0")(x))
            x = nn.relu(_Conv3x3(filters, dtype=self.dtype, name=f"enc{i}_conv1")(x))
            x = nn.relu(_Conv3x3(filters, dtype=self.dtype, name=f"enc{i}_conv2")(x))

        # Global average pooling (reference src/prob_unet.py:73)
        h = x.mean(axis=(1, 2), keepdims=True)  # (B, 1, 1, C)
        mu = _Conv3x3(self.latent_dim, kernel=1, dtype=self.dtype, name="conv_mu")(h)
        log_sigma = _Conv3x3(
            self.latent_dim, kernel=1, dtype=self.dtype, name="conv_log_sigma"
        )(h)
        # distribution parameters in f32 (rsample/KL stability)
        return DiagGaussian(
            mu=mu[:, 0, 0, :].astype(jnp.float32),
            log_sigma=log_sigma[:, 0, 0, :].astype(jnp.float32),
        )
