"""Fused Fcomb decode kernel.

Computes, for U-Net features F (B, S, C) (S = H*W flattened spatial),
latents z (B, M, D) and the three 1x1-conv layers of Fcomb
(reference src/prob_unet.py:87-138, re-derived in
probunet_tpu.models.fcomb):

    h0 = relu(F @ Wf + z @ Wz + b0)      # layer-0 concat-conv, split form
    h1 = relu(h0 @ W1 + b1)
    out = h1 @ W2 + b2                    # (B, M, S, K)

as ONE Pallas kernel. Why a kernel instead of XLA:

- the (B, M, S, C) hidden activations never round-trip to HBM — each
  spatial tile stays in VMEM through all three matmuls + ReLUs;
- the feature-side layer-0 matmul ``F @ Wf`` is computed ONCE per spatial
  tile and cached in VMEM scratch, reused across all M ensemble members
  (grid iterates members innermost), so ensemble decode does
  S*C*C + M*(S*C*C + S*C*K) MACs instead of M*(2*S*C*C + S*C*K);
- lane alignment: C (32) and K (3) are far below the 128-lane width, so
  weights/outputs are zero-padded to 128 lanes once on the host side — the
  MXU then runs fully tiled instead of Mosaic masking every op.

The public entry :func:`fcomb_fused` is a ``jax.custom_vjp``: forward is
the Pallas kernel, backward is the straightforward XLA formulation (the
backward has different data reuse and XLA already fuses it well).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _pad_to(x: jax.Array, size: int, axis: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(f_ref, z_ref, wf_ref, wz_ref, b0_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, out_ref, featpart_ref):
    """Grid (B, S_tiles, M) — members innermost so the feature-side layer-0
    matmul in ``featpart_ref`` scratch is computed once per (b, s) tile.

    Matmul operands keep the input dtype (bf16 rides the MXU natively);
    accumulation is always f32 (``preferred_element_type`` + f32 scratch),
    outputs are written back in the input dtype.
    """
    m = pl.program_id(2)
    dt = f_ref.dtype

    @pl.when(m == 0)
    def _():
        featpart_ref[:, :] = jnp.dot(
            f_ref[0], wf_ref[:, :], preferred_element_type=jnp.float32
        )

    z_row = z_ref[0, pl.ds(m, 1), :]  # (1, Dp) — member m of this batch elem
    z_bias = (
        jnp.dot(z_row, wz_ref[:, :], preferred_element_type=jnp.float32)
        + b0_ref[:, :]
    )  # (1, Cp)
    h = jnp.maximum(featpart_ref[:, :] + z_bias, 0.0).astype(dt)
    h = jnp.maximum(
        jnp.dot(h, w1_ref[:, :], preferred_element_type=jnp.float32)
        + b1_ref[:, :],
        0.0,
    ).astype(dt)
    out = (
        jnp.dot(h, w2_ref[:, :], preferred_element_type=jnp.float32)
        + b2_ref[:, :]
    )
    # store only the true K output channels — the weight matrix is lane-padded
    # for the MXU but writing padded outputs would amplify HBM traffic ~42x
    k_true = out_ref.shape[-1]
    out_ref[0, 0] = out[:, :k_true].astype(dt)


def _forward(feats, z, wf, wz, b0, w1, b1, w2, b2, tile_s: int = 512):
    """feats (B, S, C), z (B, M, D) -> (B, M, S, K) via the Pallas kernel.

    Runs in the features' dtype (bf16 stays bf16 end-to-end; f32 accumulate
    inside the kernel); biases stay f32 so the accumulator adds are exact.
    """
    b, s, c = feats.shape
    m, d = z.shape[1], z.shape[2]
    k = w2.shape[1]

    cp = _round_up(c, _LANE)
    dp = _round_up(d, _LANE)
    kp = _round_up(k, _LANE)
    sp = _round_up(s, tile_s)

    dt = feats.dtype
    f32 = jnp.float32
    feats_p = _pad_to(_pad_to(feats, sp, 1), cp, 2)
    # z path stays f32: it is tiny ((1, D) x (D, C) per member) and f32
    # sublane tiling is required for the per-member dynamic row slice
    z_p = _pad_to(z.astype(f32), dp, 2)
    wz_p = _pad_to(_pad_to(wz.astype(f32), dp, 0), cp, 1)
    wf_p = _pad_to(_pad_to(wf.astype(dt), cp, 0), cp, 1)
    w1_p = _pad_to(_pad_to(w1.astype(dt), cp, 0), cp, 1)
    w2_p = _pad_to(_pad_to(w2.astype(dt), cp, 0), kp, 1)
    b0_p = _pad_to(b0.astype(f32)[None], cp, 1)
    b1_p = _pad_to(b1.astype(f32)[None], cp, 1)
    b2_p = _pad_to(b2.astype(f32)[None], kp, 1)

    grid = (b, sp // tile_s, m)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_s, cp), lambda bi, si, mi: (bi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dp), lambda bi, si, mi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, cp), lambda bi, si, mi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, cp), lambda bi, si, mi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda bi, si, mi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, cp), lambda bi, si, mi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda bi, si, mi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, kp), lambda bi, si, mi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda bi, si, mi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_s, k), lambda bi, si, mi: (bi, mi, si, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, sp, k), dt),
        scratch_shapes=[pltpu.VMEM((tile_s, cp), f32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * sp * cp * (cp + m * (cp + kp)),
            bytes_accessed=4 * (b * sp * cp + b * m * sp * kp),
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(feats_p, z_p, wf_p, wz_p, b0_p, w1_p, b1_p, w2_p, b2_p)
    return out[:, :, :s, :k]


def _reference(feats, z, wf, wz, b0, w1, b1, w2, b2):
    """XLA formulation — used for the backward pass and as the numerical
    oracle in tests (matches probunet_tpu.models.fcomb.Fcomb.ensemble)."""
    feat_part = jnp.einsum("bsc,co->bso", feats, wf)
    z_part = jnp.einsum("bmd,do->bmo", z, wz) + b0
    h = jax.nn.relu(feat_part[:, None] + z_part[:, :, None])
    h = jax.nn.relu(jnp.einsum("bmso,ou->bmsu", h, w1) + b1)
    return jnp.einsum("bmsu,uk->bmsk", h, w2) + b2


@partial(jax.custom_vjp, nondiff_argnums=())
def fcomb_fused(feats, z, wf, wz, b0, w1, b1, w2, b2):
    """Fused Fcomb ensemble decode.

    feats (B, S, C) float, z (B, M, D), weights in matmul layout
    (wf (C, C), wz (D, C), w1 (C, C), w2 (C, K), biases 1-D).
    Returns (B, M, S, K) in the features' dtype (f32 accumulation inside).
    """
    return _forward(feats, z, wf, wz, b0, w1, b1, w2, b2)


def _fwd(feats, z, wf, wz, b0, w1, b1, w2, b2):
    out = _forward(feats, z, wf, wz, b0, w1, b1, w2, b2)
    return out, (feats, z, wf, wz, b0, w1, b1, w2, b2)


def _bwd(res, g):
    # match the XLA oracle's output dtype to the kernel's (mixed-precision
    # inputs make the einsum promote to f32 while the kernel emits bf16)
    out_dt = res[0].dtype

    def ref_fn(*a):
        return _reference(*a).astype(out_dt)

    _, vjp = jax.vjp(ref_fn, *res)
    return vjp(g)


fcomb_fused.defvjp(_fwd, _bwd)
