"""Inside-the-block profile: what the UNetBlock's time is actually made of.

Follow-up to scripts/profile_levels.py (which showed no level at its MXU
lane-fill bound): times each constituent op of UNetBlock (models/layers.py:
218-314) at every level's flagship shape, plus whole-block ablations
(dropout off, FiLM off), so the fusion opportunity is quantified per op
before any kernel is written.

All rngs use the rbg impl exactly like the real train step
(train/state.py rng_impl="rbg").

Usage: python scripts/profile_block.py [bs]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, ".")

from probunet_tpu.models.layers import (  # noqa: E402
    EDMConv, EDMGroupNorm, INIT_EDM, INIT_ZERO, UNetBlock,
)

SHAPES = [  # flagship levels: (H, W, C)
    (128, 128, 32),
    (64, 64, 64),
    (32, 32, 128),
    (16, 16, 256),
]


def sync(x):
    return float(jax.device_get(jnp.ravel(jax.tree.leaves(x)[0])[0]))


def timeit(fn, *args, n=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def grad_of(apply_fn):
    def fb(p, v, *rest):
        def loss(p_, v_):
            return jnp.sum(apply_fn(p_, v_, *rest).astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1))(p, v)
    return fb


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dt = jnp.bfloat16
    key = jax.random.key(0)
    rbg = jax.random.key(0, impl="rbg")
    emb_ch = 128

    for (h, w, c) in SHAPES:
        x = jax.random.normal(key, (bs, h, w, c), dt)
        emb = jnp.zeros((bs, emb_ch), jnp.float32)
        print(f"\n=== (bs={bs}, {h}x{w}, C={c}) bf16 — tensor "
              f"{bs*h*w*c*2/1e6:.0f} MB ===")

        # --- isolated ops ---
        conv = EDMConv(c, 3, init=INIT_EDM, dtype=dt)
        pc = jax.jit(lambda k, v: nn.Module.init(conv, k, v))(key, x)

        def conv_fwd(p, v):
            return conv.apply(p, v)

        print(f"{'conv3x3 fwd':<28s} {timeit(jax.jit(conv_fwd), pc, x):8.2f} ms")
        print(f"{'conv3x3 f+b':<28s} "
              f"{timeit(jax.jit(grad_of(conv_fwd)), pc, x):8.2f} ms")

        gn = EDMGroupNorm(dtype=dt)
        pg = jax.jit(lambda k, v: nn.Module.init(gn, k, v, silu=True))(key, x)

        def gn_fwd(p, v):
            return gn.apply(p, v, silu=True)

        print(f"{'GN+SiLU fwd':<28s} {timeit(jax.jit(gn_fwd), pg, x):8.2f} ms")
        print(f"{'GN+SiLU f+b':<28s} "
              f"{timeit(jax.jit(grad_of(gn_fwd)), pg, x):8.2f} ms")

        # GN -> FiLM -> SiLU -> dropout (the conv0->conv1 chain, rbg rng)
        gn2 = EDMGroupNorm(dtype=dt)
        pg2 = jax.jit(lambda k, v: nn.Module.init(gn2, k, v))(key, x)
        sc = jnp.zeros((bs, 1, 1, c), jnp.float32)

        def chain_fwd(p, v, scale, shift, k):
            y = nn.silu(shift + gn2.apply(p, v) * (scale + 1))
            mask = jax.random.bernoulli(k, 0.9, y.shape)
            return jnp.where(mask, y / 0.9, 0).astype(v.dtype)

        jc = jax.jit(chain_fwd)
        print(f"{'GN+FiLM+SiLU+drop fwd':<28s} "
              f"{timeit(jc, pg2, x, sc, sc, rbg):8.2f} ms")

        def chain_fb(p, v, scale, shift, k):
            def loss(p_, v_):
                return jnp.sum(chain_fwd(p_, v_, scale, shift, k)
                               .astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1))(p, v)

        print(f"{'GN+FiLM+SiLU+drop f+b':<28s} "
              f"{timeit(jax.jit(chain_fb), pg2, x, sc, sc, rbg):8.2f} ms")

        # dropout alone
        def drop(v, k):
            mask = jax.random.bernoulli(k, 0.9, v.shape)
            return jnp.where(mask, v / 0.9, 0)

        print(f"{'dropout(rbg) fwd':<28s} {timeit(jax.jit(drop), x, rbg):8.2f} ms")

        # --- whole block, ablations (f+b) ---
        for label, kw in (
            ("block full", dict()),
            ("block dropout=0", dict(dropout=0.0)),
            ("block no-FiLM", dict(adaptive_scale=False)),
        ):
            blk = UNetBlock(out_channels=c, dropout=kw.get("dropout", 0.10),
                            adaptive_scale=kw.get("adaptive_scale", True),
                            init=INIT_EDM, init_zero=INIT_ZERO, dtype=dt)
            pb = jax.jit(lambda r, v, e: nn.Module.init(
                blk, r, v, e, True))({"params": key, "dropout": rbg}, x, emb)

            def blk_fb(p, v, e):
                def loss(p_, v_):
                    return jnp.sum(blk.apply(
                        p_, v_, e, True, rngs={"dropout": rbg})
                        .astype(jnp.float32))
                return jax.grad(loss, argnums=(0, 1))(p, v)

            print(f"{'%s f+b' % label:<28s} "
                  f"{timeit(jax.jit(blk_fb), pb, x, emb):8.2f} ms")


if __name__ == "__main__":
    main()
