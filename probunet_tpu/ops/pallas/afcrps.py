"""Fused ensemble-CRPS terms kernel (forward + analytic backward).

The afCRPS/CRPS losses (reference src/prob_unet_utils.py:171-268) reduce to
two per-batch sums over the ensemble tensor x (B, M, P) and target y (B, P):

    t1(b) = sum_{j, p}   |x_bjp - y_bp|
    t2(b) = sum_{j<k, p} |x_bjp - x_bkp|

XLA's best formulation of t2 (the fused pairwise O(M^2) broadcast) measured
~10 ms fwd / ~24 ms fwd+bwd at B=64, M=15, P=49152 on v5e — an op whose
roofline (one 188 MB read + ~1.4e9 VPU ops) is ~1 ms. This kernel closes
that gap:

- one grid step per (batch element, lane tile): the (M, TILE_P) block is
  read ONCE into VMEM and every pairwise term is computed from registers;
- the j<k sum is vectorized by PAIR DISTANCE: for d = 1..M-1 the slice
  |x[:M-d] - x[d:]| covers all pairs with k-j = d as one (M-d, TILE_P)
  vector op — full sublane+lane utilization, no (M, M, P) broadcast and no
  mask (the reference materializes the full [B, M, M, C, H, W] tensor);
- the backward is ANALYTIC, not autodiff-through-sort (the sorted-identity
  form's gradient is a scatter that measured 577 ms — see ops.losses):
      dL/dx_j = g1 * sign(x_j - y) + g2 * sum_{k != j} sign(x_j - x_k)
      dL/dy   = -g1 * sum_j sign(x_j - y)
  computed with the same distance-d slicing, as a second kernel.

Member (M) padding is handled by STATIC slices inside the kernel (padded
sublane rows are simply never touched); lane (P) padding contributes
|0 - 0| = 0 to every term. Accumulation is f32 regardless of input dtype.

On non-TPU backends the kernels run in interpret mode (numerics-identical;
used by the CPU test suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8
_TILE_P = 16384


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fwd_kernel(x_ref, y_ref, t1_ref, t2_ref, *, m):
    # diffs in the input dtype (bf16 = 2x VPU throughput), f32 accumulation
    x = x_ref[0, :m, :]                           # (M, TP)
    y = y_ref[0, 0, :]                            # (TP,)
    v1 = jnp.sum(jnp.abs(x - y[None, :]), dtype=jnp.float32)
    v2 = jnp.float32(0.0)
    for d in range(1, m):
        # all pairs with k - j = d, one (M-d, TP) vector op
        v2 += jnp.sum(jnp.abs(x[: m - d, :] - x[d:, :]), dtype=jnp.float32)

    # accumulate across lane tiles: ti is the minor-most grid axis, so the
    # (1, 1, 128) output block stays resident between consecutive steps
    # (the standard Pallas TPU reduction pattern)
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _init():
        t1_ref[0, 0, :] = jnp.full((_LANE,), v1, jnp.float32)
        t2_ref[0, 0, :] = jnp.full((_LANE,), v2, jnp.float32)

    @pl.when(ti != 0)
    def _accum():
        t1_ref[0, 0, :] = t1_ref[0, 0, :] + v1
        t2_ref[0, 0, :] = t2_ref[0, 0, :] + v2


def _bwd_kernel(x_ref, y_ref, g1_ref, g2_ref, dx_ref, dy_ref, *, m):
    x = x_ref[0, :m, :]                           # input dtype
    y = y_ref[0, 0, :]
    g1 = g1_ref[0, 0, 0]
    g2 = g2_ref[0, 0, 0]

    # signs in f32: Mosaic has no bf16 vector compare on this target
    s0 = jnp.sign((x - y[None, :]).astype(jnp.float32))     # (M, TP)
    acc = jnp.zeros((m, x.shape[1]), jnp.float32)           # pair sign-count
    for d in range(1, m):
        s = jnp.sign((x[: m - d, :] - x[d:, :]).astype(jnp.float32))
        pad = jnp.zeros((d, s.shape[1]), jnp.float32)
        acc = acc + (
            jnp.concatenate([s, pad], axis=0)     # +s at rows j
            - jnp.concatenate([pad, s], axis=0)   # -s at rows j+d
        )
    dx = g1 * s0 + g2 * acc
    dx_ref[0, :m, :] = dx.astype(dx_ref.dtype)
    if dx_ref.shape[1] > m:  # zero the member-padding rows
        dx_ref[0, m:, :] = jnp.zeros(
            (dx_ref.shape[1] - m, dx.shape[1]), dx_ref.dtype
        )
    dy_ref[0, 0, :] = (-g1 * jnp.sum(s0, axis=0)).astype(dy_ref.dtype)


def _pad_inputs(ens, tgt):
    b, m, p = ens.shape
    mp = _round_up(m, _SUBLANE)
    pp = _round_up(p, _TILE_P)
    ens_p = jnp.pad(ens, ((0, 0), (0, mp - m), (0, pp - p)))
    # (B, 1, P): TPU block shapes need the last two dims tile-aligned or
    # equal to the array dims — a singleton middle axis satisfies that
    tgt_p = jnp.pad(tgt, ((0, 0), (0, pp - p)))[:, None, :]
    return ens_p, tgt_p, mp, pp


def _terms_fwd_impl(ens, tgt):
    b, m, p = ens.shape
    ens_p, tgt_p, mp, pp = _pad_inputs(ens, tgt)
    nt = pp // _TILE_P
    t1, t2 = pl.pallas_call(
        functools.partial(_fwd_kernel, m=m),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, mp, _TILE_P), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _TILE_P), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, _LANE), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANE), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, _LANE), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * pp * m * (m + 3) // 1,
            bytes_accessed=ens_p.dtype.itemsize * b * mp * pp,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(ens_p, tgt_p)
    return t1[:, 0, 0], t2[:, 0, 0]  # (B,), (B,)


def _terms_bwd_impl(ens, tgt, g1, g2):
    b, m, p = ens.shape
    ens_p, tgt_p, mp, pp = _pad_inputs(ens, tgt)
    nt = pp // _TILE_P
    g1 = jnp.broadcast_to(
        jnp.asarray(g1, jnp.float32).reshape(b, 1, 1), (b, 1, _LANE))
    g2 = jnp.broadcast_to(
        jnp.asarray(g2, jnp.float32).reshape(b, 1, 1), (b, 1, _LANE))
    dx, dy = pl.pallas_call(
        functools.partial(_bwd_kernel, m=m),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, mp, _TILE_P), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _TILE_P), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANE), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANE), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, mp, _TILE_P), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _TILE_P), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, mp, pp), ens.dtype),
            jax.ShapeDtypeStruct((b, 1, pp), tgt.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * pp * m * (m + 3),
            bytes_accessed=2 * ens_p.dtype.itemsize * b * mp * pp,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(ens_p, tgt_p, g1, g2)
    return dx[:, :m, :p], dy[:, 0, :p]


@jax.custom_vjp
def ensemble_crps_terms(ens: jax.Array, tgt: jax.Array):
    """(t1, t2) per batch element: t1 = sum |x_j - y|, t2 = sum_{j<k} |x_j - x_k|.

    ens (B, M, P), tgt (B, P) -> two (B,) f32 arrays. Fused Pallas kernel
    with analytic gradient (see module docstring).
    """
    return _terms_fwd_impl(ens, tgt)


def _vjp_fwd(ens, tgt):
    return _terms_fwd_impl(ens, tgt), (ens, tgt)


def _vjp_bwd(res, g):
    ens, tgt = res
    g1, g2 = g
    return _terms_bwd_impl(ens, tgt, g1, g2)


ensemble_crps_terms.defvjp(_vjp_fwd, _vjp_bwd)


def ensemble_crps_terms_partitioned(ens: jax.Array, tgt: jax.Array):
    """:func:`ensemble_crps_terms`, shard_mapped over the active kernel mesh.

    Under a multi-chip GSPMD step the bare ``pallas_call`` is an opaque
    custom call that XLA would replicate on every chip (round-2 advisor
    finding); this wrapper runs it on each chip's local (batch, pixel)
    shard instead, psumming the pixel partial sums over the spatial axis —
    exact, because every CRPS term is pointwise in the pixel until the
    final sum. Falls back to the bare kernel when no >1-device kernel mesh
    is registered (see ops/pallas/partition.py).
    """
    from jax.sharding import PartitionSpec as P

    from probunet_tpu.ops.pallas.partition import active_kernel_mesh, psum_if

    b, _, p = ens.shape
    mesh, b_ax, s_ax = active_kernel_mesh(b, p)
    if mesh is None:
        return ensemble_crps_terms(ens, tgt)

    def body(ens, tgt):
        t1, t2 = ensemble_crps_terms(ens, tgt)
        return psum_if(t1, s_ax), psum_if(t2, s_ax)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(b_ax, None, s_ax), P(b_ax, s_ax)),
        out_specs=(P(b_ax), P(b_ax)),
        check_vma=False,
    )(ens, tgt)
