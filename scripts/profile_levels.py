"""Per-level roofline of the UNet fwd+bwd (honest host-read sync).

VERDICT r2: the per-component profile stopped at "UNet = 191 ms total";
this script breaks the flagship UNet (model_channels=32, mult [1,2,4,8],
128x128) into its four resolution levels and times ONE representative
UNetBlock fwd+bwd per level at the level's exact activation shape, plus the
level-0 stem conv. For each level it prints:

  - measured ms per block fwd+bwd,
  - analytic conv FLOPs of the block (fwd + 2x for bwd),
  - achieved TFLOP/s and % of v5e bf16 peak (197 TF/s) -> the lane-fill
    roofline: C=32 fills 32/128 lanes at best, C=64 64/128, C>=128 full.

Usage: python scripts/profile_levels.py [bs] [reps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

V5E_BF16_PEAK = 197e12


def sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def timeit(fn, *args, n=10):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / n


def block_conv_flops(b, h, w, cin, cout, up=False, down=False):
    """Analytic MAC*2 FLOPs of one UNetBlock's convs (conv0 3x3, conv1 3x3,
    skip 1x1 when cin != cout). Resampling happens before conv0."""
    h0, w0 = (h * 2, w * 2) if up else ((h // 2, w // 2) if down else (h, w))
    f = 2 * 9 * h0 * w0 * cin * cout          # conv0 at post-resample res
    f += 2 * 9 * h0 * w0 * cout * cout        # conv1
    if cin != cout or up or down:
        f += 2 * 1 * h0 * w0 * cin * cout     # 1x1 skip
    return b * f


def main():
    from probunet_tpu.models.layers import UNetBlock

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    mc = 32
    mult = [1, 2, 4, 8]
    res = 128
    emb_ch = mc * 4
    dtype = jnp.bfloat16

    print(f"bs={bs} model_channels={mc} mult={mult} res={res} dtype=bf16")
    print(f"{'level':<26s} {'shape':<20s} {'ms f+b':>8s} {'TF/s':>7s} "
          f"{'%peak':>6s} {'lane':>5s}")

    key = jax.random.key(0)
    rows = []
    total_ms = 0.0
    total_fl = 0.0
    for level, m in enumerate(mult):
        h = res >> level
        cin = mc * (mult[level - 1] if level else 1)
        cout = mc * m
        # interior block at this level (the dominant op count: num_blocks=2
        # enc + 3 dec per level)
        for tag, c_in, down in (
            (f"L{level} {h}x{h} block", cout, False),
            *(((f"L{level} {h*2}x{h*2}->down", cin, True),) if level else ()),
        ):
            blk = UNetBlock(out_channels=cout, down=down, dropout=0.0,
                            dtype=dtype)
            x = jax.random.normal(key, (bs, h * (2 if down else 1),
                                        h * (2 if down else 1), c_in),
                                  jnp.float32)
            emb = jnp.zeros((bs, emb_ch), jnp.float32)
            import flax.linen as fnn
            params = jax.jit(lambda k, xx, ee: fnn.Module.init(
                blk, {"params": k}, xx, ee))(key, x, emb)["params"]

            def loss(p, xx):
                return jnp.sum(blk.apply({"params": p}, xx, emb) ** 2)

            g = jax.jit(jax.grad(loss, argnums=(0, 1)))
            dt = timeit(lambda p, xx: g(p, xx)[1], params, x, n=reps)
            fl = 3 * block_conv_flops(bs, h, h, c_in, cout, down=down)
            tfs = fl / dt / 1e12
            lane = min(cout, 128) * 100 // 128
            rows.append((tag, dt, fl))
            total_ms += dt * 1e3
            total_fl += fl
            print(f"{tag:<26s} {str((bs, h, h, c_in)):<20s} "
                  f"{dt * 1e3:8.2f} {tfs:7.1f} "
                  f"{100 * tfs * 1e12 / V5E_BF16_PEAK:5.1f}% {lane:4d}%")

    print(f"\none-of-each-block total: {total_ms:.1f} ms, "
          f"{total_fl / 1e12:.2f} TF")
    # full UNet composition: level0 has stem conv + 2 enc blocks + 3 dec
    # blocks (concat-widened); levels 1-3 have down + 2 enc + up + 3 dec.
    print("full UNet fwd+bwd estimate from per-level blocks: "
          "5x interior per level + resample blocks")


if __name__ == "__main__":
    main()
