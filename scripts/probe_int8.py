"""Go/no-go probe: does int8 buy anything on this backend for the serve path?

The 16-member ensemble-generation path is HBM-bandwidth-bound at ~27% MFU
(DESIGN.md "Inference-path roofline"). int8 would halve activation bytes
and v5e's MXU has a 2x int8 MAC path (394 TOPS vs 197 TF/s bf16), so a
quantized serving mode is *theoretically* worth up to ~2x. This probe
measures, on the real chip, whether XLA:TPU actually delivers:

  1. peak check  — 4096^3 matmul, bf16 vs int8 (is the int8 MXU path
     reachable at all, and at what rate?)
  2. hot shape   — the flagship conv (bs=128, 128x128, C=32->32, 3x3),
     bf16 vs int8-with-requantize (the realistic serving chain: conv in
     int8, rescale, clip, back to int8)

Both chained inside ONE jitted lax.scan and synchronized by a scalar host
read (bench.py `_sync` semantics — block_until_ready lies on this backend).

Decision rule (written before measuring): pursue an int8 serving path only
if the hot-shape int8 chain beats bf16 by >=1.4x; otherwise record the
numbers here and retire the idea.

Usage: python scripts/probe_int8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def _sync(x) -> float:
    return float(jax.device_get(jnp.ravel(x)[0].astype(jnp.float32)))


def timed(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def probe_matmul(n=4096, iters=32):
    """Chained n^3 matmuls; returns (bf16 TF/s, int8 TOPS)."""
    macs = iters * 2 * n**3

    key = jax.random.key(0)
    a16 = jax.random.normal(key, (n, n), jnp.bfloat16)
    w16 = jax.random.normal(jax.random.fold_in(key, 1), (n, n), jnp.bfloat16)

    @jax.jit
    def chain_bf16(a, w):
        def body(c, _):
            c = jnp.dot(c, w)
            # keep magnitudes bounded so the chain stays finite
            return (c * jnp.bfloat16(1e-3)).astype(jnp.bfloat16), None
        c, _ = lax.scan(body, a, None, length=iters)
        return c

    t16 = timed(chain_bf16, a16, w16)

    a8 = jax.random.randint(key, (n, n), -127, 127, jnp.int8)
    w8 = jax.random.randint(jax.random.fold_in(key, 1), (n, n), -127, 127,
                            jnp.int8)

    @jax.jit
    def chain_int8(a, w):
        def body(c, _):
            acc = lax.dot_general(c, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
            # requantize: shift back into int8 range (realistic serving step)
            return (acc >> 12).astype(jnp.int8), None
        c, _ = lax.scan(body, a, None, length=iters)
        return c

    t8 = timed(chain_int8, a8, w8)
    return macs / t16 / 1e12, macs / t8 / 1e12, t16, t8


def probe_conv(b=128, hw=128, c=32, iters=32):
    """Chained 3x3 SAME convs at the flagship hot shape."""
    macs = iters * 2 * b * hw * hw * 9 * c * c
    key = jax.random.key(0)
    dn = lax.conv_dimension_numbers((b, hw, hw, c), (3, 3, c, c),
                                    ("NHWC", "HWIO", "NHWC"))

    x16 = jax.random.normal(key, (b, hw, hw, c), jnp.bfloat16)
    w16 = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, c, c),
                             jnp.bfloat16) * 0.05).astype(jnp.bfloat16)

    @jax.jit
    def chain_bf16(x, w):
        def body(cr, _):
            y = lax.conv_general_dilated(cr, w, (1, 1), "SAME",
                                         dimension_numbers=dn)
            return y.astype(jnp.bfloat16), None
        y, _ = lax.scan(body, x, None, length=iters)
        return y

    t16 = timed(chain_bf16, x16, w16)

    x8 = jax.random.randint(key, (b, hw, hw, c), -127, 127, jnp.int8)
    w8 = jax.random.randint(jax.random.fold_in(key, 1), (3, 3, c, c), -8, 8,
                            jnp.int8)

    @jax.jit
    def chain_int8(x, w):
        def body(cr, _):
            acc = lax.conv_general_dilated(cr, w, (1, 1), "SAME",
                                           dimension_numbers=dn,
                                           preferred_element_type=jnp.int32)
            # requantize to int8 (shift keeps it cheap; a real path would
            # scale per channel — same VPU cost class)
            return jnp.clip(acc >> 8, -127, 127).astype(jnp.int8), None
        y, _ = lax.scan(body, x, None, length=iters)
        return y

    t8 = timed(chain_int8, x8, w8)
    return macs / t16 / 1e12, macs / t8 / 1e12, t16, t8


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    mm16, mm8, tm16, tm8 = probe_matmul()
    print(f"matmul 4096^3 x32 : bf16 {mm16:7.1f} TF/s ({tm16*1e3:7.1f} ms)  "
          f"int8 {mm8:7.1f} TOPS ({tm8*1e3:7.1f} ms)  "
          f"speedup {tm16/tm8:4.2f}x", flush=True)
    cv16, cv8, tc16, tc8 = probe_conv()
    print(f"conv 128x128^2 c32: bf16 {cv16:7.1f} TF/s ({tc16*1e3:7.1f} ms)  "
          f"int8 {cv8:7.1f} TOPS ({tc8*1e3:7.1f} ms)  "
          f"speedup {tc16/tc8:4.2f}x", flush=True)
    verdict = "PURSUE" if tc16 / tc8 >= 1.4 else "RETIRE"
    print(f"verdict: {verdict} (decision rule: hot-shape int8 >= 1.4x bf16)")


if __name__ == "__main__":
    main()
