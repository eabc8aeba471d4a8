"""Fused Fcomb-decode + ensemble-CRPS-terms kernel (fwd + analytic bwd).

The afCRPS ELBO's reconstruction term (reference src/prob_unet.py:273-317)
is CRPS(fcomb-decoded ensemble, target): the unfused M-member decode
materializes (M, B, H, W, C) hidden activations twice plus the
(B, M, H, W, K) ensemble, all of which exist ONLY to be reduced to two
per-batch scalars

    t1(b) = sum_{m, p} |x_bmp - y_bp|
    t2(b) = sum_{j<k, p} |x_bjp - x_bkp|      (p ranges over H*W*K)

Measured on v5e at the flagship shape (B=128, M=15, 128x128x3, bf16) the
unfused chain costs ~15 ms fcomb fwd + ~9 ms loss fwd (~50 ms through
backward), and its backward temps (2x bf16[15,256,128,128,32] = 7.5 GB at
bs=256) are exactly what pushes bs=256 out of HBM. This kernel computes
t1/t2 straight from the layer-0 projections:

- grid = (batch, pixel tiles); the (C, TILE_P) feature tile is VMEM-resident
  and reused by all M members;
- channels-first layout throughout, so every matmul has TILE_P (full) lanes
  and no in-kernel relayouts are needed; bf16 operands with f32 accumulation
  (the same rounding points as models/fcomb.py);
- per member: h0 = relu(feat + z_m); h1 = relu(W1^T h0 + b1);
  x_m = W2^T h1 + b2;
- the j<k sum is vectorized by pair distance like ops/pallas/afcrps.py;
- the backward is ANALYTIC with in-kernel recompute of h0/h1 (no stored
  hiddens, no sort, no scatter): given upstream (g1, g2),
      dx_m = g1 sign(x_m - y) + g2 sum_{k != m} sign(x_m - x_k)
  chained through the two ReLU matmuls, accumulating dW1/db1/dW2/db2 across
  the whole grid, d_z per batch over pixel tiles, d_feat per tile.

Only the kernel carries a custom_vjp; the cheap surrounding projections
(feats @ W0f and zs @ W0z + b0 — the split-matmul form of the reference's
concat conv, see models/fcomb.py) stay in XLA and autodiff normally, so
gradients flow to ALL fcomb parameters, the latents, and the U-Net features.

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
_K_PAD = 8          # output-channel rows padded to one sublane tile
_TILE_P = 2048      # pixels per grid step, forward (H*W axis)
_TILE_P_BWD = 1024  # backward keeps h0/h1/ens scratch -> tighter VMEM


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dot(a, b, cdt):
    """a @ b with operands rounded to ``cdt`` and f32 accumulation.

    On CPU (interpret mode) the bf16 x bf16 -> f32 dot thunk is unsupported,
    so operands are bf16-ROUNDED then computed in f32 — the same operand
    rounding, slightly more accurate accumulation; numerics-equivalent for
    the test suite's tolerances."""
    if jax.default_backend() != "tpu" and cdt == jnp.bfloat16:
        a = a.astype(cdt).astype(jnp.float32)
        b = b.astype(cdt).astype(jnp.float32)
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)
    return jax.lax.dot(a.astype(cdt), b.astype(cdt),
                       preferred_element_type=jnp.float32)


def _dot_t(a, b, cdt):
    """a @ b^T (contract the last axes), same dtype policy as _dot."""
    if jax.default_backend() != "tpu" and cdt == jnp.bfloat16:
        a = a.astype(cdt).astype(jnp.float32)
        b = b.astype(cdt).astype(jnp.float32)
    else:
        a = a.astype(cdt)
        b = b.astype(cdt)
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _decode_member(feat, z_col, w1t, b1, w2t8, b2_8, cdt):
    """One member's decode, channels-first.

    feat (C, TP) f32, z_col (C, 1) f32 -> (h0, h1, x8) with x8 (K_PAD, TP);
    rows k..K_PAD of x8 are exactly zero (w2t8/b2_8 are zero-padded).
    """
    h0 = jnp.maximum(feat + z_col, 0.0)
    h1 = jnp.maximum(_dot(w1t, h0, cdt) + b1, 0.0)
    x8 = _dot(w2t8, h1, cdt) + b2_8
    return h0, h1, x8


def _fwd_kernel(feat_ref, z_ref, w1t_ref, b1_ref, w2t8_ref, b2_ref, y_ref,
                t1_ref, t2_ref, ens_ref, *, m, p_real, cdt):
    feat = feat_ref[0]                       # (C, TP) f32
    y = y_ref[0]                             # (K_PAD, TP) f32, rows k.. zero
    w1t = w1t_ref[...]
    b1 = b1_ref[...]                         # (C, 1)
    w2t8 = w2t8_ref[...]                     # (K_PAD, C), rows k.. zero
    b2_8 = b2_ref[...]                       # (K_PAD, 1), rows k.. zero

    tp = feat.shape[1]
    pi = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1) + pi * tp
    valid = (col < p_real).astype(jnp.float32)          # (1, TP)

    for j in range(m):
        _, _, x8 = _decode_member(feat, z_ref[0, :, j:j + 1],
                                  w1t, b1, w2t8, b2_8, cdt)
        ens_ref[j] = x8 * valid

    ens = ens_ref[...]                                  # (M_pad, K_PAD, TP)
    v1 = jnp.sum(jnp.abs(ens[:m] - y[None]), dtype=jnp.float32)
    v2 = jnp.float32(0.0)
    for d in range(1, m):
        v2 += jnp.sum(jnp.abs(ens[: m - d] - ens[d:m]), dtype=jnp.float32)

    @pl.when(pi == 0)
    def _init():
        t1_ref[0, 0, :] = jnp.full((_LANE,), v1, jnp.float32)
        t2_ref[0, 0, :] = jnp.full((_LANE,), v2, jnp.float32)

    @pl.when(pi != 0)
    def _accum():
        t1_ref[0, 0, :] = t1_ref[0, 0, :] + v1
        t2_ref[0, 0, :] = t2_ref[0, 0, :] + v2


def _bwd_kernel(feat_ref, z_ref, w1_ref, w1t_ref, b1_ref, w2p8_ref,
                w2t8_ref, b2_ref, y_ref, g1_ref, g2_ref,
                dfeat_ref, dz_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dy_ref, ens_ref, h0_ref, h1_ref, *, m, p_real, cdt):
    feat = feat_ref[0]
    y = y_ref[0]
    w1 = w1_ref[...]
    w1t = w1t_ref[...]
    b1 = b1_ref[...]
    w2p8 = w2p8_ref[...]                     # (C, K_PAD), cols k.. zero
    w2t8 = w2t8_ref[...]
    b2_8 = b2_ref[...]
    g1 = g1_ref[0, 0, 0]
    g2 = g2_ref[0, 0, 0]
    c = feat.shape[0]
    tp = feat.shape[1]

    bi = pl.program_id(0)
    pi = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1) + pi * tp
    valid = (col < p_real).astype(jnp.float32)

    # recompute the decode, keeping h0/h1 per member in VMEM scratch
    for j in range(m):
        h0, h1, x8 = _decode_member(feat, z_ref[0, :, j:j + 1],
                                    w1t, b1, w2t8, b2_8, cdt)
        h0_ref[j] = h0
        h1_ref[j] = h1
        ens_ref[j] = x8 * valid

    ens = ens_ref[...]
    # dx_m = g1 sign(x_m - y) + g2 sum_{k != m} sign(x_m - x_k)
    s0 = jnp.sign(ens[:m] - y[None])                    # (M, K_PAD, TP)
    acc = jnp.zeros_like(s0)
    for d in range(1, m):
        s = jnp.sign(ens[: m - d] - ens[d:m])
        pad = jnp.zeros((d,) + s.shape[1:], jnp.float32)
        acc = acc + (
            jnp.concatenate([s, pad], axis=0)
            - jnp.concatenate([pad, s], axis=0)
        )
    dx_all = (g1 * s0 + g2 * acc) * valid[None]         # (M, K_PAD, TP)

    dfeat = jnp.zeros((c, tp), jnp.float32)
    dw1 = jnp.zeros((c, c), jnp.float32)
    db1 = jnp.zeros((c, 1), jnp.float32)
    dw2 = jnp.zeros((c, _K_PAD), jnp.float32)
    db2 = jnp.zeros((_K_PAD, 1), jnp.float32)
    dz_cols = []
    for j in range(m):
        dx = dx_all[j]                                  # (K_PAD, TP)
        h0 = h0_ref[j]
        h1 = h1_ref[j]
        dh1 = _dot(w2p8, dx, cdt)                       # W2 @ dx -> (C, TP)
        dw2 += _dot_t(h1, dx, cdt)                      # h1 dx^T -> (C, K_PAD)
        db2 += jnp.sum(dx, axis=1, keepdims=True)
        da1 = dh1 * (h1 > 0).astype(jnp.float32)
        dh0 = _dot(w1, da1, cdt)                        # W1 @ da1 -> (C, TP)
        dw1 += _dot_t(h0, da1, cdt)                     # h0 da1^T -> (C, C)
        db1 += jnp.sum(da1, axis=1, keepdims=True)
        du = dh0 * (h0 > 0).astype(jnp.float32)         # (C, TP)
        dfeat += du
        dz_cols.append(jnp.sum(du, axis=1, keepdims=True))   # (C, 1)

    dfeat_ref[0] = dfeat
    dy_ref[0] = -g1 * jnp.sum(s0, axis=0)

    dz_tile = jnp.concatenate(dz_cols, axis=1)          # (C, M)

    @pl.when(pi == 0)
    def _dz_init():
        dz_ref[0] = jnp.zeros_like(dz_ref[0])
        dz_ref[0, :, :m] = dz_tile

    @pl.when(pi != 0)
    def _dz_accum():
        dz_ref[0, :, :m] = dz_ref[0, :, :m] + dz_tile

    first = jnp.logical_and(bi == 0, pi == 0)

    @pl.when(first)
    def _w_init():
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        dw2_ref[...] = dw2
        db2_ref[...] = db2

    @pl.when(jnp.logical_not(first))
    def _w_accum():
        dw1_ref[...] = dw1_ref[...] + dw1
        db1_ref[...] = db1_ref[...] + db1
        dw2_ref[...] = dw2_ref[...] + dw2
        db2_ref[...] = db2_ref[...] + db2


def _prep(feat_t, z_t, w1, b1, w2, b2, target_t, tile_p):
    """Pad/transpose the operands into kernel layouts (all f32)."""
    b, c, p = feat_t.shape
    m = z_t.shape[2]
    k = target_t.shape[1]
    assert k <= _K_PAD, f"num_classes {k} > {_K_PAD} not supported"
    mp = _round_up(max(m, 2), _K_PAD)
    pp = _round_up(p, tile_p)
    f32 = jnp.float32
    feat_p = jnp.pad(feat_t.astype(f32), ((0, 0), (0, 0), (0, pp - p)))
    z_p = jnp.pad(z_t.astype(f32), ((0, 0), (0, 0), (0, mp - m)))
    y_p = jnp.pad(target_t.astype(f32),
                  ((0, 0), (0, _K_PAD - k), (0, pp - p)))
    w1f = w1.astype(f32)
    w1t = w1f.T
    b1c = b1.astype(f32).reshape(c, 1)
    w2p8 = jnp.pad(w2.astype(f32), ((0, 0), (0, _K_PAD - k)))   # (C, K_PAD)
    w2t8 = w2p8.T                                               # (K_PAD, C)
    b2c = jnp.pad(b2.astype(f32).reshape(k, 1), ((0, _K_PAD - k), (0, 0)))
    return (feat_p, z_p, w1f, w1t, b1c, w2p8, w2t8, b2c, y_p,
            b, c, m, mp, k, p, pp)


@functools.lru_cache(maxsize=4)
def _terms_fn(cdt_name: str):
    """custom_vjp'd kernel pair for one compute dtype (bf16 / f32)."""
    cdt = jnp.bfloat16 if cdt_name == "bfloat16" else jnp.float32

    def fwd_impl(feat_t, z_t, w1, b1, w2, b2, target_t):
        (feat_p, z_p, _, w1t, b1c, _, w2t8, b2c, y_p,
         b, c, m, mp, k, p, pp) = _prep(feat_t, z_t, w1, b1, w2, b2,
                                        target_t, _TILE_P)
        nt = pp // _TILE_P
        kern = functools.partial(_fwd_kernel, m=m, p_real=p, cdt=cdt)
        t1, t2 = pl.pallas_call(
            kern,
            grid=(b, nt),
            in_specs=[
                pl.BlockSpec((1, c, _TILE_P), lambda bi, pi: (bi, 0, pi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c, mp), lambda bi, pi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, c), lambda bi, pi: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, 1), lambda bi, pi: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_K_PAD, c), lambda bi, pi: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_K_PAD, 1), lambda bi, pi: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _K_PAD, _TILE_P), lambda bi, pi: (bi, 0, pi),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, _LANE), lambda bi, pi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, _LANE), lambda bi, pi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, 1, _LANE), jnp.float32),
                jax.ShapeDtypeStruct((b, 1, _LANE), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((mp, _K_PAD, _TILE_P), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * b * pp * m * (2 * c * c + c * k)
                + b * pp * m * (m + 3),
                bytes_accessed=4 * b * pp * (c + _K_PAD),
                transcendentals=0,
            ),
            interpret=jax.default_backend() != "tpu",
        )(feat_p, z_p, w1t, b1c, w2t8, b2c, y_p)
        return t1[:, 0, 0], t2[:, 0, 0]

    def bwd_impl(feat_t, z_t, w1, b1, w2, b2, target_t, g1, g2):
        (feat_p, z_p, w1f, w1t, b1c, w2p8, w2t8, b2c, y_p,
         b, c, m, mp, k, p, pp) = _prep(feat_t, z_t, w1, b1, w2, b2,
                                        target_t, _TILE_P_BWD)
        nt = pp // _TILE_P_BWD
        g1b = jnp.broadcast_to(
            jnp.asarray(g1, jnp.float32).reshape(b, 1, 1), (b, 1, _LANE))
        g2b = jnp.broadcast_to(
            jnp.asarray(g2, jnp.float32).reshape(b, 1, 1), (b, 1, _LANE))
        kern = functools.partial(_bwd_kernel, m=m, p_real=p, cdt=cdt)
        small = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda bi, pi: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kern,
            grid=(b, nt),
            in_specs=[
                pl.BlockSpec((1, c, _TILE_P_BWD), lambda bi, pi: (bi, 0, pi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c, mp), lambda bi, pi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                small((c, c)), small((c, c)), small((c, 1)),
                small((c, _K_PAD)), small((_K_PAD, c)), small((_K_PAD, 1)),
                pl.BlockSpec((1, _K_PAD, _TILE_P_BWD), lambda bi, pi: (bi, 0, pi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, _LANE), lambda bi, pi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, _LANE), lambda bi, pi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, c, _TILE_P_BWD), lambda bi, pi: (bi, 0, pi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c, mp), lambda bi, pi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                small((c, c)), small((c, 1)), small((c, _K_PAD)),
                small((_K_PAD, 1)),
                pl.BlockSpec((1, _K_PAD, _TILE_P_BWD), lambda bi, pi: (bi, 0, pi),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, c, pp), jnp.float32),
                jax.ShapeDtypeStruct((b, c, mp), jnp.float32),
                jax.ShapeDtypeStruct((c, c), jnp.float32),
                jax.ShapeDtypeStruct((c, 1), jnp.float32),
                jax.ShapeDtypeStruct((c, _K_PAD), jnp.float32),
                jax.ShapeDtypeStruct((_K_PAD, 1), jnp.float32),
                jax.ShapeDtypeStruct((b, _K_PAD, pp), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((mp, _K_PAD, _TILE_P_BWD), jnp.float32),
                pltpu.VMEM((mp, c, _TILE_P_BWD), jnp.float32),
                pltpu.VMEM((mp, c, _TILE_P_BWD), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=6 * b * pp * m * (2 * c * c + c * k)
                + 2 * b * pp * m * (m + 3),
                bytes_accessed=8 * b * pp * (c + _K_PAD),
                transcendentals=0,
            ),
            interpret=jax.default_backend() != "tpu",
        )(feat_p, z_p, w1f, w1t, b1c, w2p8, w2t8, b2c, y_p, g1b, g2b)
        dfeat, dz, dw1, db1, dw2, db2, dy = outs
        return (
            dfeat[:, :, :p].astype(feat_t.dtype),
            dz[:, :, :m].astype(z_t.dtype),
            dw1.astype(w1.dtype),
            db1[:, 0].astype(b1.dtype),
            dw2[:, :k].astype(w2.dtype),
            db2[:k, 0].astype(b2.dtype),
            dy[:, :k, :p].astype(target_t.dtype),
        )

    @jax.custom_vjp
    def terms(feat_t, z_t, w1, b1, w2, b2, target_t):
        return fwd_impl(feat_t, z_t, w1, b1, w2, b2, target_t)

    def vjp_fwd(feat_t, z_t, w1, b1, w2, b2, target_t):
        out = fwd_impl(feat_t, z_t, w1, b1, w2, b2, target_t)
        return out, (feat_t, z_t, w1, b1, w2, b2, target_t)

    def vjp_bwd(res, g):
        return bwd_impl(*res, g[0], g[1])

    terms.defvjp(vjp_fwd, vjp_bwd)
    return terms


def fused_elbo_enabled() -> bool:
    """Whether the ELBO should route afCRPS/CRPS through the fused kernel.

    PROBUNET_FUSED_ELBO = auto (default) | 1 | 0. ``auto`` enables it on
    TPU when either exactly one device is visible or the parallel step
    builders registered a kernel mesh (ops/pallas/partition.py) — then
    :func:`fcomb_crps_terms` runs shard_map-wrapped per chip. A bare
    multi-device run (no registered mesh) keeps it off: the pallas_call
    carries no GSPMD partitioning spec, so the mesh would replicate its
    operands (see ops.losses._crps_impl). Read at TRACE time (cached in
    the jitted step).

    ``auto`` also defers to an explicit ``PROBUNET_CRPS_IMPL=xla``: that
    knob A/Bs the CRPS-terms implementations, and the fused path would
    otherwise bypass ops.losses._crps_terms entirely, silently measuring
    the fused kernel under both settings. PROBUNET_FUSED_ELBO=1 still
    forces the fused path regardless.
    """
    import os

    v = os.environ.get("PROBUNET_FUSED_ELBO", "auto")
    if v == "auto":
        if os.environ.get("PROBUNET_CRPS_IMPL") == "xla":
            return False
        if jax.default_backend() != "tpu":
            return False
        from probunet_tpu.ops.pallas.partition import kernel_mesh_is_active

        return len(jax.devices()) == 1 or kernel_mesh_is_active()
    return v == "1"


def fcomb_crps_terms(feat_t, z_t, w1, b1, w2, b2, target_t,
                     compute_dtype: str = "bfloat16"):
    """(t1, t2) per batch element over the fcomb-decoded ensemble.

    feat_t   (B, C, P) f32 — feats @ W0f, channels-first (P = H*W);
    z_t      (B, C, M) f32 — (zs @ W0z + b0) transposed;
    w1/b1    (C, C)/(C,), w2/b2 (C, K)/(K,) — fcomb layers 1-2;
    target_t (B, K, P) f32 — channels-first target.

    Equal to ops.losses._crps_terms(fcomb.ensemble(...), target) without
    materializing the ensemble or hiddens. Differentiable (custom vjp).

    When a >1-device kernel mesh is registered (ops/pallas/partition.py),
    the kernel is shard_mapped: batch over the data axis, pixels over the
    spatial axis (exact — the decode and every CRPS term are pointwise in
    the pixel until the final sum, which psums its spatial partials), with
    the fcomb weights replicated; their cross-shard gradient psum comes
    from shard_map's transpose rule (tests/test_parallel.py asserts the
    whole thing against the unsharded oracle).
    """
    terms = _terms_fn(str(compute_dtype))
    b, _, p = feat_t.shape
    from probunet_tpu.ops.pallas.partition import active_kernel_mesh, psum_if

    mesh, b_ax, s_ax = active_kernel_mesh(b, p)
    if mesh is None:
        return terms(feat_t, z_t, w1, b1, w2, b2, target_t)

    from jax.sharding import PartitionSpec as P

    def body(feat_t, z_t, w1, b1, w2, b2, target_t):
        t1, t2 = terms(feat_t, z_t, w1, b1, w2, b2, target_t)
        return psum_if(t1, s_ax), psum_if(t2, s_ax)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(b_ax, None, s_ax), P(b_ax, None, None),
                  P(), P(), P(), P(), P(b_ax, None, s_ax)),
        out_specs=(P(b_ax), P(b_ax)),
        check_vma=False,
    )(feat_t, z_t, w1, b1, w2, b2, target_t)


def fused_fcomb_crps_loss(
    feature_map, zs, params, target,
    loss_type: str = "afcrps", alpha: float = 0.95,
    compute_dtype: str = "bfloat16",
):
    """afCRPS/CRPS of the M-member fcomb decode, fused end to end.

    feature_map (B, H, W, C) — U-Net features; zs (M, B, D) latent draws;
    params — dict with fcomb's layer{0,1,2}_{weight,bias} (1x1-conv shaped
    weights, models/fcomb.py); target (B, H, W, K).

    Same value as afcrps_loss(fcomb.ensemble(feats, zs), target) /
    crps_loss(...) — reference math src/prob_unet_utils.py:171-268 — with
    the layer-0 projections in XLA (autodiff) and everything else in the
    fused kernel.
    """
    b, h, w, c = feature_map.shape
    p = h * w
    k = target.shape[-1]
    m = zs.shape[0]
    if m < 2:
        raise ValueError(f"M must be >= 2 for {loss_type}, got {m}")
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    w0 = params["layer0_weight"][0, 0]                  # (C + D, C)
    b0 = params["layer0_bias"]
    w1 = params["layer1_weight"][0, 0]
    b1 = params["layer1_bias"]
    w2 = params["layer2_weight"][0, 0]
    b2 = params["layer2_bias"]

    if jax.default_backend() != "tpu" and cdt == jnp.bfloat16:
        cast = lambda a: a.astype(cdt).astype(jnp.float32)  # noqa: E731
    else:
        cast = lambda a: a.astype(cdt)  # noqa: E731
    feat_t = jnp.einsum(
        "bpc,cf->bfp",
        cast(feature_map.reshape(b, p, c)), cast(w0[:c]),
        preferred_element_type=jnp.float32,
    )                                                   # (B, C, P)
    z_part = jnp.dot(
        cast(zs), cast(w0[c:]),
        preferred_element_type=jnp.float32,
    ) + b0                                              # (M, B, C)
    z_t = jnp.transpose(z_part, (1, 2, 0))              # (B, C, M)
    target_t = jnp.moveaxis(
        target.reshape(b, p, k).astype(jnp.float32), -1, 1
    )                                                   # (B, K, P)

    t1, t2 = fcomb_crps_terms(feat_t, z_t, w1, b1, w2, b2, target_t,
                              compute_dtype=compute_dtype)
    # single home of the (t1, t2) -> loss algebra: ops.losses
    from probunet_tpu.ops.losses import afcrps_from_terms, crps_from_terms

    pk = p * k
    if loss_type == "afcrps":
        return afcrps_from_terms(t1, t2, m, pk, alpha)
    return crps_from_terms(t1, t2, m, pk)
