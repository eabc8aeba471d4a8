"""Zero-storage dropout: in-kernel counter-based PRNG, bits regenerated
in the backward pass — no mask bytes ever touch HBM.

STATUS: MEASURED AND RETIRED as a default (opt-in
``PROBUNET_DROPOUT_IMPL=pallas``). Flagship step (bs=128 bf16 M=15,
v5e): 450 samples/s / 163.0 GB/step vs the XLA bernoulli path's
639 / 122.4. The kernel does exactly what it promises — zero mask
bytes — but extracting the mask-apply to a custom call cuts the
GN→FiLM→SiLU→dropout fusion in half: the chain's intermediate output
must materialize as the kernel's input (and the cotangent on the way
back), adding ~40 GB of fusion-boundary traffic against the 19 GB of
mask bytes removed. Same failure mode as the retired GN kernels, now
measured from the opposite side. Together with the u16-bits variant
(624, layout pass) and BENCH_DROPOUT=0 (707, the bound), this closes
the dropout ledger: XLA's fusion already prices the mask traffic in,
and only a whole-chain kernel that ALSO beats XLA's GN reduce — which
round 3 failed twice with data (ops/pallas/fused_gn.py) — could
recover the 10.7%.

Why: dropout is the flagship step's one non-parity-constrained byte sink
(DESIGN.md "HBM roofline"). ``jax.random.bernoulli`` materializes u32
random bits at 4 bytes/element against the 2-byte bf16 activations they
mask, plus layout copies of those tensors (scripts/hlo_traffic.py), plus
the saved mask for the backward pass — 19.2 GB of the step's 122.4 GB
and 10.7% of throughput (BENCH_DROPOUT=0 A/B). The u16-bits XLA variant
(models/layers.py `_dropout`, PROBUNET_DROPOUT_BITS=16) lost: the
bitcast forces a layout pass. This kernel moves ZERO mask bytes in
either direction: forward reads x and writes y; backward reads the
cotangent and writes dx; the mask is a pure function of (seed words,
grid position, lane index) recomputed in-register both times
(fused_gn._dropout_uniform — a murmur3-finalizer hash that lowers
identically under Mosaic and in interpret mode, so masks bit-reproduce
across TPU and the CPU test suite).

Semantics match inverted dropout: P(drop) = p, survivors scaled by
1/(1-p). The mask stream differs from ``jax.random.bernoulli``'s (any
fixed relabeling of dropout randomness is parity-neutral); determinism
w.r.t. the "dropout" rng collection is preserved by deriving the two
seed words from the folded-in JAX key exactly like the fused GN kernel
(models/layers.py seed derivation).

The forward and backward are the SAME computation applied to x and the
cotangent respectively (mask-multiply is linear), so one pallas_call
serves both — the custom_vjp residual is just the (2,) seed vector.

Reference behavior being reimplemented: torch ``nn.Dropout(dropout)``
inside UNetBlock, reference src/networks.py:176.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probunet_tpu.ops.pallas.fused_gn import _dropout_uniform

_LANE = 128
_MAX_BLOCK_ROWS = 2048  # 2048x128 f32 block = 1 MB of VMEM


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(seed_ref, x_ref, o_ref, *, p_drop):
    salt = pl.program_id(0)
    u = _dropout_uniform(x_ref.shape, seed_ref[0], seed_ref[1], salt)
    keep = u >= p_drop
    scale = np.float32(1.0 / (1.0 - p_drop))
    x = x_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.where(keep, x * scale, 0).astype(o_ref.dtype)


def _block_rows(rows: int) -> int | None:
    """Largest divisor of ``rows`` that is a multiple of 8 and fits VMEM."""
    best = None
    b = 8
    while b <= min(rows, _MAX_BLOCK_ROWS):
        if rows % b == 0:
            best = b
        b += 8
    return best


def supported(shape) -> bool:
    n = int(np.prod(shape))
    return n % (8 * _LANE) == 0 and _block_rows(n // _LANE) is not None


def _apply(x, seed2, p_drop: float):
    shape, dtype = x.shape, x.dtype
    rows = int(np.prod(shape)) // _LANE
    rb = _block_rows(rows)
    flat = x.reshape(rows, _LANE)
    out = pl.pallas_call(
        functools.partial(_kernel, p_drop=p_drop),
        grid=(rows // rb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((rb, _LANE), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rb, _LANE), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, _LANE), dtype),
        interpret=_interpret(),
    )(seed2, flat)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dropout(x, seed2, p_drop: float):
    """Inverted dropout on any shape with total elements % 1024 == 0.

    ``seed2``: (2,) int32 seed words (from ``jax.random.key_data``).
    """
    return _apply(x, seed2, p_drop)


def _vjp_fwd(x, seed2, p_drop):
    return _apply(x, seed2, p_drop), seed2


def _vjp_bwd(p_drop, seed2, g):
    # mask-multiply is linear: dx re-applies the identical kernel to g,
    # regenerating the mask from the same (seed, grid) stream.
    return _apply(g, seed2, p_drop), None


dropout.defvjp(_vjp_fwd, _vjp_bwd)
