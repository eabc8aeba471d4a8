"""int8 storage of the saved-for-backward conv inputs (VERDICT r4 #4).

The last unmeasured single-chip training lever from the round-4 north-star
audit: BASELINE.md retired "lossy activation compression" with a sentence
("changes gradients") instead of a number, breaking the repo's
every-idea-gets-an-A/B rule. This module supplies the mechanism; the
numbers live in scripts/probe_act_compress.py + DESIGN.md.

Mechanism — a ``jax.custom_vjp`` around the 3x3/1x1 conv that controls
exactly what is saved for the backward pass:

    forward:   y = conv(x, w)                      (EXACT — bf16, untouched)
    residuals: q = round(x / s) int8, s (C,), w    (x itself is NOT kept)
    backward:  dx = conv_vjp_x(g, w)               (EXACT — bilinear in x,
                                                    so dx never reads x)
               dW = conv_vjp_w(dequant(q, s), g)   (the ONLY approximation)

So unlike forward-roundtrip schemes, the loss surface and every
activation are bit-identical to the float step; only the weight-gradient
sees the (<= s/2 per element) dequantization error. The conv still reads
bf16 ``x`` on the MXU in forward, so HBM *traffic* is roughly neutral
(bwd reads 1-byte q instead of 2-byte x, fwd writes q once); the real
prize is *residency*: the saved-activation footprint of every conv input
halves, which is what admitted bs=256 un-rematted (the r2 ladder OOM'd
it, and full remat lost at 522 samples/s by recomputing convs).

Enabled by ``PROBUNET_ACT_COMPRESS=int8`` (trace-time, like
PROBUNET_GN_IMPL); the env var gates EDMConv's conv call
(models/layers.py). Under pure inference nothing changes: custom_vjp
runs its primal function when not differentiated, and the quantize ops
exist only in the vjp-traced forward.

Reference: the reference trains torch fp32 with no compression
(src/networks.py); this is a framework extension probed under the
QUALITY.md seed-noise decision rule.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["act8_conv", "enabled"]


def enabled() -> bool:
    """Trace-time gate (read once per trace, like ops.pallas._gn_impl)."""
    import os

    return os.environ.get("PROBUNET_ACT_COMPRESS", "") == "int8"


def _plain_conv(x, w, pad: int, dt):
    return lax.conv_general_dilated(
        x.astype(dt), w.astype(dt),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt if dt != jnp.float32 else jnp.float32,
    )


def _quantize_channels(x):
    """Per-channel symmetric int8: (q, s) with x ~= q * s, |err| <= s/2."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)),
                     axis=tuple(range(x.ndim - 1)))
    s = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
    return q, s


@lru_cache(maxsize=None)
def _act8_conv_for(pad: int, dt_name: str):
    """One custom_vjp conv per (pad, dtype) pair — cached so repeated
    traces reuse the same primitive (a fresh custom_vjp per call would
    defeat jit caching)."""
    dt = jnp.dtype(dt_name).type

    @jax.custom_vjp
    def conv(x, w):
        return _plain_conv(x, w, pad, dt)

    def fwd(x, w):
        y = _plain_conv(x, w, pad, dt)
        q, s = _quantize_channels(x)
        # residuals must be JAX types: a zero-size token carries x's dtype
        # (bwd must return dx in exactly the primal input dtype)
        return y, (q, s, w, jnp.empty((0,), x.dtype))

    def bwd(res, g):
        q, s, w, xdt_token = res
        xh = (q.astype(jnp.float32) * s).astype(xdt_token.dtype)
        # both cotangents via the float conv's own vjp at the dequantized
        # input: dx = g *conv* w^T is bilinear — independent of xh, EXACT;
        # dW = xh *conv* g carries the int8 error (the only approximation).
        _, vjp = jax.vjp(lambda xx, ww: _plain_conv(xx, ww, pad, dt), xh, w)
        return vjp(g)

    conv.defvjp(fwd, bwd)
    return conv


def act8_conv(x, w, pad: int, dt):
    """conv(x, w) whose backward keeps x only as per-channel int8."""
    return _act8_conv_for(pad, jnp.dtype(dt).name)(x, w)
