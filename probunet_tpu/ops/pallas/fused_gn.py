"""Fused GroupNorm -> FiLM -> SiLU -> dropout kernel (fwd + analytic bwd).

scripts/profile_levels.py (round 3) showed NO UNet level runs at its MXU
lane-fill bound: the binding cost is the HBM-bound normalization/activation
chains between convs (each GroupNorm costs a cross-HW reduce pass plus an
apply pass, dropout another mask+apply pass, and XLA cannot fuse a
cross-spatial reduction into the producing conv). This kernel computes the
whole UNetBlock inter-conv chain (models/layers.py, reference
src/networks.py:97-107,168-175)

    y = dropout( silu( (gn(x) * gamma + beta) * (scale + 1) + shift ) )

in ONE pass over HBM per direction, with an analytic backward.

STATUS: RETIRED as a default (round-3 v5e measurement, honest host-read
timing). At block scope the kernel LOST to XLA's own GN fusion — UNetBlock
f+b 12.81 ms vs 9.03 ms at the dominant (bs=128, 128x128, C=32) shape,
isolated chain f+b 7.62 vs 3.34 ms — and the flagship train step does not
compile: the decoder's 128x128 concat block (C=64, k=2 -> 8192x128 rows)
wants 20.7 MB of scoped VMEM against the 16 MB limit because the f32
elementwise intermediates double the footprint of the bf16 block. XLA
chains the GN reduce into the producing conv's epilogue and recomputes
cheap elementwise in the backward, so the one-pass-per-direction traffic
argument below never materialized as wall-clock. Kept importable, tested,
and opt-in (PROBUNET_GN_IMPL=pallas) as the measured record.

Design notes (what the kernel does differently from round 1's attempt):

- **Lane packing.** NHWC with C=32 fills 32 of the VPU's 128 lanes; the
  round-1 kernel (and XLA's GN reduce) eat the 4x lane waste. Here the
  (HW, C) block is reshaped FREE (contiguous memory) to (HW/k, k*C) with
  k chosen so k*C is a multiple of 128 — every elementwise op and
  reduction runs full-lane.
- **Affine collapse.** GroupNorm + affine + FiLM collapse into per-column
  constants: z = x*A + B, so the apply phase is one fused multiply-add per
  element plus the SiLU transcendental. Channel vectors (gamma/beta/
  scale/shift) are pre-tiled to k*C columns OUTSIDE the kernel (O(C)
  bytes); group<->column expansion/reduction inside the kernel is done
  with a tiny constant 0/1 mask matmul — no 1-D reshapes for Mosaic to
  trip on.
- **Analytic backward in the same collapsed form.** All four parameter
  gradients and the GN input gradient are linear in two column sums
  (sum dz, sum dz*x):
      dx = dz*c1 + x*c2 + c3   (per-column c1,c2,c3)
  so the backward is one elementwise pass + two reductions — not the
  multi-pass chain XLA autodiff emits.
- **Per-batch grid.** One grid step per batch element keeps the largest
  block (128x128xC96 decoder concat input) at ~3 MB of VMEM, far under
  the 16 MB budget that killed the round-1 kernel, and lets Mosaic
  pipeline the next element's DMA behind the current compute.
- **In-kernel stateless PRNG.** Dropout uniforms
  come from a counter-based murmur-finalizer hash of (element index,
  caller seed words, batch index) in pure integer VPU ops; the backward
  regenerates
  the identical mask — nothing stored, nothing re-read.

Numerics match the flax nn.GroupNorm(use_fast_variance) composition:
statistics accumulate in f32, the elementwise chain runs in f32 on bf16
inputs (well within bf16 rounding of the XLA path). Seed words derive from
the block's "dropout" rng collection, preserving fold_in determinism.

On non-TPU backends the kernels run in interpret mode (numerics-identical;
used by the CPU test suite).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _pack_factor(hw: int, c: int) -> int | None:
    """Smallest k with (k*c) % 128 == 0, hw % k == 0 and (hw/k) % 8 == 0."""
    k = _LANE // int(np.gcd(c, _LANE))
    if hw % k or (hw // k) % 8:
        return None
    return int(k)


def _dropout_uniform(shape, seed_a, seed_b, salt):
    """Counter-based stateless uniforms in [0, 1) — pure jnp integer ops.

    A murmur3-finalizer hash of (element index, seed words, batch salt):
    full-lane VPU integer math that lowers identically under Mosaic and in
    interpret mode (pltpu.prng_* has no CPU-interpret rule), so dropout
    masks bit-reproduce across TPU and the CPU test suite.
    """
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    z = r * np.uint32(shape[1]) + c
    z = z + seed_a.astype(jnp.uint32) * np.uint32(2654435761)
    z = z + seed_b.astype(jnp.uint32)
    z = z + salt.astype(jnp.uint32) * np.uint32(40503)
    for mult in (np.uint32(0x85EBCA6B), np.uint32(0xC2B2AE35)):
        z = z ^ jax.lax.shift_right_logical(z, np.uint32(16))
        z = z * mult
    z = z ^ jax.lax.shift_right_logical(z, np.uint32(16))
    hi = jax.lax.shift_right_logical(z, np.uint32(8))
    # Mosaic has no uint32->f32 cast rule; hi < 2**24 so int32 is lossless.
    return hi.astype(jnp.int32).astype(jnp.float32) * np.float32(2.0**-24)


def _group_masks(c: int, groups: int, k: int):
    """(k*C, G) 0/1 f32 mask M: column j belongs to group (j % C) // Cg.

    v_cols @ M reduces columns to groups; m_groups @ M.T expands back.
    """
    cg = c // groups
    kc = k * c
    col_g = (jax.lax.broadcasted_iota(jnp.int32, (kc, groups), 0) % c) // cg
    gid = jax.lax.broadcasted_iota(jnp.int32, (kc, groups), 1)
    return (col_g == gid).astype(jnp.float32)


def _fwd_kernel(x_ref, gam_ref, bet_ref, sc_ref, sh_ref, mask_ref, seed_ref,
                y_ref, mean_ref, rstd_ref, *, eps, p_drop, silu, n):
    x = x_ref[0]                                             # (HW/k, k*C)
    mask = mask_ref[:]                                       # (k*C, G)
    s1 = jnp.sum(x, axis=0, keepdims=True, dtype=jnp.float32)
    s2 = jnp.sum(x * x, axis=0, keepdims=True, dtype=jnp.float32)
    mean = jnp.dot(s1, mask, preferred_element_type=jnp.float32) / n
    ex2 = jnp.dot(s2, mask, preferred_element_type=jnp.float32) / n
    rstd = jax.lax.rsqrt(ex2 - mean * mean + eps)            # (1, G)
    mean_ref[0] = mean
    rstd_ref[0] = rstd

    mt = mask.T
    mean_c = jnp.dot(mean, mt, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd, mt, preferred_element_type=jnp.float32)
    gam = gam_ref[:]                                         # (1, k*C) f32
    bet = bet_ref[:]
    sc1 = sc_ref[0] + 1.0
    p = rstd_c * gam
    a = p * sc1
    b = (bet - mean_c * p) * sc1 + sh_ref[0]
    z = x.astype(jnp.float32) * a + b
    out = z * jax.nn.sigmoid(z) if silu else z
    if p_drop > 0.0:
        u = _dropout_uniform(x.shape, seed_ref[0], seed_ref[1],
                             pl.program_id(0))
        out = jnp.where(u >= p_drop, out * (1.0 / (1.0 - p_drop)), 0.0)
    y_ref[0] = out.astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, gam_ref, bet_ref, sc_ref, sh_ref, mask_ref,
                seed_ref, mean_ref, rstd_ref,
                dx_ref, dgam_ref, dbet_ref, dsc_ref, dsh_ref,
                *, eps, p_drop, silu, n):
    x = x_ref[0]
    g = g_ref[0]
    mask = mask_ref[:]
    mt = mask.T
    mean = mean_ref[0]                                       # (1, G)
    rstd = rstd_ref[0]
    mean_c = jnp.dot(mean, mt, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd, mt, preferred_element_type=jnp.float32)
    gam = gam_ref[:]
    bet = bet_ref[:]
    sc1 = sc_ref[0] + 1.0
    p = rstd_c * gam                                         # u = x*P + Q
    q = bet - mean_c * p
    a = p * sc1                                              # z = x*A + B
    b = q * sc1 + sh_ref[0]

    xf = x.astype(jnp.float32)
    z = xf * a + b
    if silu:
        sig = jax.nn.sigmoid(z)
        dact = sig * (1.0 + z * (1.0 - sig))
    else:
        dact = 1.0
    dz = g.astype(jnp.float32) * dact
    if p_drop > 0.0:
        u = _dropout_uniform(x.shape, seed_ref[0], seed_ref[1],
                             pl.program_id(0))
        dz = jnp.where(u >= p_drop, dz * (1.0 / (1.0 - p_drop)), 0.0)

    s_dz = jnp.sum(dz, axis=0, keepdims=True)                # (1, k*C)
    s_dzx = jnp.sum(dz * xf, axis=0, keepdims=True)

    # parameter gradients, per column (caller folds k*C -> C and sums B)
    dsh_ref[0] = s_dz
    dsc_ref[0] = s_dzx * p + s_dz * q
    du_s = s_dz * sc1                                        # sum du
    dux_hat = (s_dzx - mean_c * s_dz) * rstd_c * sc1         # sum du*xhat
    dbet_ref[0] = du_s
    dgam_ref[0] = dux_hat

    # GN input grad via group means of dxhat and dxhat*xhat
    s_dxh = du_s * gam
    s_dxhx = dux_hat * gam
    m1 = jnp.dot(jnp.dot(s_dxh, mask, preferred_element_type=jnp.float32)
                 / n, mt, preferred_element_type=jnp.float32)
    m2 = jnp.dot(jnp.dot(s_dxhx, mask, preferred_element_type=jnp.float32)
                 / n, mt, preferred_element_type=jnp.float32)
    c1 = rstd_c * gam * sc1
    c2 = -(rstd_c * rstd_c) * m2
    c3 = rstd_c * (mean_c * rstd_c * m2 - m1)
    dx = dz * c1 + xf * c2 + c3
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _prep(x, gamma, beta, scale, shift, groups):
    bsz, h, w, c = x.shape
    hw = h * w
    k = _pack_factor(hw, c)
    assert k is not None, (h, w, c)
    xp = x.reshape(bsz, hw // k, k * c)
    tile_c = lambda v: jnp.tile(v.astype(jnp.float32)[None, :], (1, k))
    tile_b = lambda v: jnp.tile(v.astype(jnp.float32), (1, k))[:, None, :]
    mask = _group_masks(c, groups, k)
    n = float(hw * (c // groups))
    return (xp, tile_c(gamma), tile_c(beta), tile_b(scale), tile_b(shift),
            mask, k, n)


def _block_specs(bsz, rows, kc, groups, k, c):
    big = pl.BlockSpec((1, rows, kc), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)              # (1, k*C) const
    bvec = pl.BlockSpec((1, 1, kc), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)             # (B, 1, k*C)
    grp = pl.BlockSpec((1, 1, groups), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)              # (B, 1, G)
    return big, vec, bvec, grp


def _fwd_impl(x, gamma, beta, scale, shift, seed2, *, groups, eps, p_drop,
              silu):
    bsz, h, w, c = x.shape
    xp, gam, bet, sc, sh, mask, k, n = _prep(
        x, gamma, beta, scale, shift, groups)
    rows, kc = xp.shape[1], xp.shape[2]
    big, vec, bvec, grp = _block_specs(bsz, rows, kc, groups, k, c)
    y, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, p_drop=p_drop, silu=silu,
                          n=n),
        grid=(bsz,),
        in_specs=[big, vec, vec, bvec, bvec, vec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[big, grp, grp],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, rows, kc), x.dtype),
            jax.ShapeDtypeStruct((bsz, 1, groups), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, groups), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bsz * h * w * c,
            bytes_accessed=2 * x.dtype.itemsize * bsz * h * w * c,
            transcendentals=bsz * h * w * c,
        ),
        interpret=_interpret(),
    )(xp, gam, bet, sc, sh, mask, seed2)
    return y.reshape(bsz, h, w, c), mean, rstd


def _fold_cols(v, k, c):
    """(B, 1, k*C) f32 column grads -> (B, C)."""
    return jnp.sum(v.reshape(v.shape[0], k, c), axis=1)


def _bwd_impl(x, g, gamma, beta, scale, shift, seed2, mean, rstd, *,
              groups, eps, p_drop, silu):
    bsz, h, w, c = x.shape
    xp, gam, bet, sc, sh, mask, k, n = _prep(
        x, gamma, beta, scale, shift, groups)
    gp = g.reshape(xp.shape)
    rows, kc = xp.shape[1], xp.shape[2]
    big, vec, bvec, grp = _block_specs(bsz, rows, kc, groups, k, c)
    dx, dgam, dbet, dsc, dsh = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, p_drop=p_drop, silu=silu,
                          n=n),
        grid=(bsz,),
        in_specs=[big, big, vec, vec, bvec, bvec, vec,
                  pl.BlockSpec(memory_space=pltpu.SMEM), grp, grp],
        out_specs=[big, bvec, bvec, bvec, bvec],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, rows, kc), x.dtype),
            jax.ShapeDtypeStruct((bsz, 1, kc), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, kc), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, kc), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, kc), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * bsz * h * w * c,
            bytes_accessed=3 * x.dtype.itemsize * bsz * h * w * c,
            transcendentals=bsz * h * w * c,
        ),
        interpret=_interpret(),
    )(xp, gp, gam, bet, sc, sh, mask, seed2, mean, rstd)
    return (dx.reshape(bsz, h, w, c),
            jnp.sum(_fold_cols(dgam, k, c), axis=0),
            jnp.sum(_fold_cols(dbet, k, c), axis=0),
            _fold_cols(dsc, k, c), _fold_cols(dsh, k, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def gn_film_silu_dropout(x, gamma, beta, scale, shift, seed2,
                         groups: int, eps: float, p_drop: float, silu: bool):
    """dropout(silu((gn(x)*gamma + beta)*(scale+1) + shift)) in one pass.

    x (B,H,W,C) float; gamma/beta (C,) f32; scale/shift (B,C) f32 (zeros
    for plain GN+SiLU); seed2 (2,) int32 dropout seed words (ignored when
    p_drop == 0). Returns y in x's dtype. Differentiable in x, gamma,
    beta, scale, shift.
    """
    y, _, _ = _fwd_impl(x, gamma, beta, scale, shift, seed2, groups=groups,
                        eps=eps, p_drop=p_drop, silu=silu)
    return y


def _vjp_fwd(x, gamma, beta, scale, shift, seed2, groups, eps, p_drop, silu):
    y, mean, rstd = _fwd_impl(x, gamma, beta, scale, shift, seed2,
                              groups=groups, eps=eps, p_drop=p_drop,
                              silu=silu)
    return y, (x, gamma, beta, scale, shift, seed2, mean, rstd)


def _vjp_bwd(groups, eps, p_drop, silu, res, g):
    x, gamma, beta, scale, shift, seed2, mean, rstd = res
    dx, dgam, dbet, dsc, dsh = _bwd_impl(
        x, g, gamma, beta, scale, shift, seed2, mean, rstd,
        groups=groups, eps=eps, p_drop=p_drop, silu=silu)
    dseed = np.zeros(seed2.shape, jax.dtypes.float0)
    return (dx, dgam.astype(gamma.dtype), dbet.astype(beta.dtype),
            dsc.astype(scale.dtype), dsh.astype(shift.dtype), dseed)


gn_film_silu_dropout.defvjp(_vjp_fwd, _vjp_bwd)


def supported(h: int, w: int, c: int, groups: int) -> bool:
    """Whether the kernel handles this shape (see _pack_factor)."""
    return c % groups == 0 and _pack_factor(h * w, c) is not None
