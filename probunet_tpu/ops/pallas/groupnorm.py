"""Fused GroupNorm + SiLU kernel.

The UNetBlock hot path is GN -> SiLU -> conv (reference
src/networks.py:159-160, GN with adaptive group count at :97-107). XLA
fuses SiLU into the conv but keeps GroupNorm as separate
reduce/broadcast passes over HBM; this kernel does the whole
normalize-scale-shift-activate in one VMEM residency per batch element.

Implementation notes (TPU-first):

- one grid step per batch element; the (S, C) image block stays in VMEM;
- group statistics are computed with an indicator-matrix matmul
  ``x @ G`` (C x num_groups zeros/ones) instead of a reshape to
  (S, groups, C/groups) — reshapes across the lane dimension are
  lane-crossing shuffles on TPU, matmuls ride the MXU;
- channels are zero-padded to the 128-lane width on the host side; the
  indicator matrix carries the true group sizes so padding does not skew
  the statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(x_ref, g_ref, gcount_ref, gamma_ref, beta_ref, out_ref, *, eps):
    x = x_ref[0]                      # (S, C)
    gmat = g_ref[:, :]                # (C, G) indicator
    n = gcount_ref[:, :]              # (1, G) true element count per group

    s1 = jnp.dot(x, gmat, preferred_element_type=jnp.float32)       # (S, G)
    s2 = jnp.dot(x * x, gmat, preferred_element_type=jnp.float32)   # (S, G)
    mean_g = jnp.sum(s1, axis=0, keepdims=True) / n                 # (1, G)
    var_g = jnp.sum(s2, axis=0, keepdims=True) / n - mean_g * mean_g

    # lift group stats back to channels: (1, G) @ (G, C)
    gmat_t = gmat.T
    mean_c = jnp.dot(mean_g, gmat_t, preferred_element_type=jnp.float32)
    var_c = jnp.dot(var_g, gmat_t, preferred_element_type=jnp.float32)

    inv = jax.lax.rsqrt(var_c + eps)
    y = (x - mean_c) * inv * gamma_ref[:, :] + beta_ref[:, :]
    out_ref[0] = y * jax.nn.sigmoid(y)  # SiLU


def _groupnorm_silu_xla(x, gamma, beta, num_groups, eps=1e-5):
    """XLA formulation (flax GroupNorm + silu numerics): the backward pass
    and the numerical oracle for the kernel."""
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    xg = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, -1, c) * gamma.astype(jnp.float32) + beta.astype(
        jnp.float32)
    return (y * jax.nn.sigmoid(y)).reshape(orig_shape)


def groupnorm_silu(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm (channels-last, groups over C) + SiLU.

    x (B, S, C) or (B, H, W, C); gamma/beta (C,). Returns same shape/f32.
    Matches flax GroupNorm + silu numerics (the XLA oracle in tests).
    Differentiable: forward is the Pallas kernel, backward the XLA
    formulation (same pattern as ops.pallas.fcomb).
    """
    return _raw(x, gamma, beta, num_groups, eps)


from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _raw(x, gamma, beta, num_groups, eps):
    return _forward_kernel(x, gamma, beta, num_groups, eps)


def _raw_fwd(x, gamma, beta, num_groups, eps):
    return _forward_kernel(x, gamma, beta, num_groups, eps), (x, gamma, beta)


def _raw_bwd(num_groups, eps, res, g):
    # the primal (kernel) output is f32, as is the XLA formulation's; jax.vjp
    # returns cotangents in the residuals' own dtypes
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda a, w, b: _groupnorm_silu_xla(a, w, b, num_groups, eps),
        x, gamma, beta,
    )
    return vjp(g)


_raw.defvjp(_raw_fwd, _raw_bwd)


def _forward_kernel(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    orig_shape = x.shape
    if x.ndim == 4:
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
    b, s, c = x.shape
    if c % num_groups:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    cg = c // num_groups

    cp = _round_up(c, _LANE)
    gp = _round_up(num_groups, _LANE)

    # indicator matrix: channel i belongs to group i // cg
    gmat = np.zeros((cp, gp), np.float32)
    gmat[np.arange(c), np.arange(c) // cg] = 1.0
    gcount = np.zeros((1, gp), np.float32)
    gcount[0, :num_groups] = s * cg
    gcount[0, num_groups:] = 1.0  # avoid 0/0 in padded groups

    f32 = jnp.float32
    pad_c = cp - c
    x_p = jnp.pad(x.astype(f32), ((0, 0), (0, 0), (0, pad_c)))
    gamma_p = jnp.pad(gamma.astype(f32), (0, pad_c))[None]
    beta_p = jnp.pad(beta.astype(f32), (0, pad_c))[None]

    from functools import partial

    out = pl.pallas_call(
        partial(_kernel, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, cp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, gp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, cp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, cp), f32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * cp * gp * 2 + 8 * b * s * cp,
            bytes_accessed=8 * b * s * cp,
            transcendentals=b * s * cp,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x_p, jnp.asarray(gmat), jnp.asarray(gcount), gamma_p, beta_p)

    out = out[:, :, :c]
    return out.reshape(orig_shape)
