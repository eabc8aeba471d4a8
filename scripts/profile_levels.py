"""Per-level U-Net roofline: measured TF/s vs the MXU lane-fill bound.

VERDICT r2 next-round item 1: the round-2 profile stopped at "UNet fwd+bwd
= 191 ms" with a single aggregate lane-fill argument pinned to the C=32
level-0 convs. This script breaks the flagship UNet (mc=32, mult=(1,2,4,8)
-> C=32/64/128/256 at 128/64/32/16 px) into its four resolution levels,
times each level's encoder+decoder block stack in isolation (fwd and
fwd+bwd, honest host-read sync), reads each stack's FLOPs from the
compiled executable's cost analysis, and reports achieved TF/s against
the level's lane-fill-adjusted peak:

    achievable(level) = PEAK_BF16 * min(Cout / 128, 1)

(the MXU contracts onto 128 lanes; a conv with Cout output channels fills
min(Cout,128) of them — reference measurements in README "Measured
performance" showed C=32 convs pinned at 25-28% of peak across all
layouts).

The per-level block specs are derived by replaying UNet.__call__'s channel
bookkeeping (models/unet.py:148-200), and the sum of level times is
validated against the monolithic UNet fwd+bwd so the decomposition can't
silently drift from the real model.

Usage: python scripts/profile_levels.py [bs] [--dtype bfloat16]
"""

from __future__ import annotations

import sys
import time
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, ".")

from probunet_tpu.models.layers import (  # noqa: E402
    EDMConv, EDMGroupNorm, INIT_EDM, INIT_ZERO, UNetBlock,
)

PEAK_BF16_TFS = 197.0  # v5e chip bf16 peak


def sync(x):
    return float(jax.device_get(jnp.ravel(jax.tree.leaves(x)[0])[0]))


def timeit(fn, *args, n=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def flops_of(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile()
        a = c.cost_analysis()
        if isinstance(a, list):
            a = a[0]
        return float(a["flops"])
    except Exception:
        return float("nan")


# ---------------------------------------------------------------------------
# Replay UNet.__call__'s per-level structure (models/unet.py:148-200)
# ---------------------------------------------------------------------------

def level_specs(mc=32, mults=(1, 2, 4, 8), num_blocks=2, in_ch=3):
    """Per level: list of ('conv'|'block', dict) for encoder and decoder,
    plus the input channel count each stack sees."""
    enc, skips_ch = {}, []
    cout = in_ch
    enc_in = {}
    for level, mult in enumerate(mults):
        ops = []
        enc_in[level] = cout
        if level == 0:
            cout = mc * mult
            ops.append(("conv", dict(out=cout)))
        else:
            ops.append(("block", dict(out=cout, down=True)))
        skips_ch.append((level, cout))
        for _ in range(num_blocks):
            cout = mc * mult
            ops.append(("block", dict(out=cout)))
            skips_ch.append((level, cout))
        enc[level] = ops

    dec, dec_in = {}, {}
    stack = list(skips_ch)
    for level, mult in reversed(list(enumerate(mults))):
        ops = []
        dec_in[level] = cout
        if level == len(mults) - 1:
            ops.append(("block", dict(out=cout)))
            ops.append(("block", dict(out=cout)))
        else:
            ops.append(("block", dict(out=cout, up=True)))
        for _ in range(num_blocks + 1):
            lv, ch = stack.pop()
            assert lv == level
            ops.append(("block", dict(out=mc * mult, concat=ch)))
            cout = mc * mult
        dec[level] = ops
    assert not stack
    return enc, dec, enc_in, dec_in


class Stack(nn.Module):
    """One level's encoder or decoder ops, with fresh skip tensors for
    concats (their production is billed to the level that made them)."""

    ops: Sequence[Tuple[str, Any]]
    dtype: Any = None

    @nn.compact
    def __call__(self, x, emb, train=True):
        rng_count = 0
        for i, (kind, kw) in enumerate(self.ops):
            if kind == "conv":
                x = EDMConv(kw["out"], 3, init=INIT_EDM, dtype=self.dtype,
                            name=f"conv{i}")(x)
                continue
            if kw.get("concat"):
                b, h, w, _ = x.shape
                skip = self.param(
                    f"skip{i}", nn.initializers.normal(1.0),
                    (1, h, w, kw["concat"]), jnp.float32,
                ).astype(x.dtype)
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(skip, (b, h, w, kw["concat"]))], -1)
            x = UNetBlock(
                out_channels=kw["out"], up=kw.get("up", False),
                down=kw.get("down", False), dropout=0.10, init=INIT_EDM,
                init_zero=INIT_ZERO, dtype=self.dtype, name=f"block{i}",
            )(x, emb, train)
            rng_count += 1
        return x


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dt = jnp.bfloat16 if "--dtype=float32" not in sys.argv else None
    mc, mults, nb = 32, (1, 2, 4, 8), 2
    res0 = 128
    emb_ch = mc * 4

    enc, dec, enc_in, dec_in = level_specs(mc, mults, nb)
    key = jax.random.key(0)
    emb = jnp.zeros((bs, emb_ch), jnp.float32)

    rows = []
    total = {"fwd": 0.0, "fb": 0.0, "flops": 0.0}
    for level, mult in enumerate(mults):
        res = res0 >> level
        c = mc * mult
        for phase, specs, cin, r_in in (
            ("enc", enc[level], enc_in[level], res0 >> max(level - 1, 0)),
            ("dec", dec[level], dec_in[level],
             res0 >> min(level + 1, len(mults) - 1)),
        ):
            mod = Stack(ops=tuple(specs), dtype=dt)
            x = jax.random.normal(key, (bs, r_in, r_in, cin),
                                  dt or jnp.float32)
            params = jax.jit(mod.init)(
                {"params": key, "dropout": key}, x, emb)["params"]

            def fwd(p, v):
                return mod.apply({"params": p}, v, emb, True,
                                 rngs={"dropout": key})

            def fb(p, v):
                def loss(p_, v_):
                    return jnp.sum(fwd(p_, v_).astype(jnp.float32))
                g = jax.grad(loss, argnums=(0, 1))(p, v)
                return g[1]

            jf, jfb = jax.jit(fwd), jax.jit(fb)
            t_f = timeit(jf, params, x)
            t_fb = timeit(jfb, params, x)
            fl_f, fl_fb = flops_of(fwd, params, x), flops_of(fb, params, x)
            fill = min(c / 128.0, 1.0)
            ach = fl_fb / t_fb / 1e12
            bound = PEAK_BF16_TFS * fill
            rows.append((f"L{level} {phase} {res}px C={c}", t_f, t_fb,
                         fl_fb / 1e12, ach, fill, 100 * ach / bound))
            total["fwd"] += t_f
            total["fb"] += t_fb
            total["flops"] += fl_fb

    print(f"\nbs={bs} dtype={'bf16' if dt else 'f32'}  "
          f"(v5e bf16 peak {PEAK_BF16_TFS} TF/s)")
    print(f"{'level':<22s} {'fwd ms':>8s} {'f+b ms':>8s} {'f+b TF':>7s} "
          f"{'TF/s':>7s} {'fill':>5s} {'%bound':>7s}")
    for name, tf_, tfb, fl, ach, fill, pct in rows:
        print(f"{name:<22s} {tf_*1e3:8.2f} {tfb*1e3:8.2f} {fl:7.3f} "
              f"{ach:7.1f} {fill:5.0%} {pct:6.0f}%")
    print(f"{'SUM':<22s} {total['fwd']*1e3:8.2f} {total['fb']*1e3:8.2f} "
          f"{total['flops']/1e12:7.3f}")

    # validate against the monolithic UNet
    from probunet_tpu.models.unet import UNet

    unet = UNet(img_resolution=(res0, res0), in_channels=3, out_channels=3,
                model_channels=mc, channel_mult=mults, num_blocks=nb,
                dtype=dt)
    x = jax.random.normal(key, (bs, res0, res0, 3), jnp.float32)
    params = jax.jit(unet.init)({"params": key, "dropout": key}, x)["params"]

    def ufb(p, v):
        def loss(p_, v_):
            return jnp.sum(unet.apply(
                {"params": p_}, v_, train=True,
                rngs={"dropout": key}).astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1))(p, v)[1]

    t_u = timeit(jax.jit(ufb), params, x)
    print(f"\nmonolithic UNet fwd+bwd: {t_u*1e3:.2f} ms "
          f"(sum of levels {total['fb']*1e3:.2f} ms, "
          f"ratio {total['fb']/t_u:.2f})")


if __name__ == "__main__":
    main()
