"""Component timing of the INFERENCE paths (honest host-read sync).

VERDICT r2 weak #2: eval/ensemble modes were 3-5x anchors with no profile.
This times the pieces of the two serve paths at their bench shapes:

  ensemble:  preprocess -> UNet fwd -> prior -> rsample(M) -> fcomb.ensemble
             -> lrinterp -> residual_to_hr          (bench.py BENCH_MODE=ensemble)
  eval:      the no-grad posterior ELBO at M=5      (BENCH_MODE=eval)

Usage: python scripts/profile_sample.py [bs] [members]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def timeit(name, fn, *args, n=20):
    try:
        out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        dt = (time.perf_counter() - t0) / n
    except Exception as e:
        print(f"{name:<34s}   FAILED ({type(e).__name__})")
        return None
    print(f"{name:<34s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    from probunet_tpu.config import preset
    from probunet_tpu.data.climex import (
        compute_stats, lrinterp_from_batch, preprocess_batch, residual_to_hr,
    )
    from probunet_tpu.data.synthetic import synthetic_climex_fields_device
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.train.loop import make_eval_step
    from probunet_tpu.train.state import create_train_state

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    members = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = preset("probunet_multivar_128")
    cfg.train.batch_size = bs
    cfg.model.compute_dtype = "bfloat16"
    res = cfg.data.resolution

    hr = synthetic_climex_fields_device(bs, res[0], res[1],
                                        cfg.data.variables, seed=0)
    stats = jax.jit(lambda a: compute_stats(a, cfg.data.lowres_scale))(hr)
    model = ProbabilisticUNet(img_resolution=res, dtype=jnp.bfloat16)
    x = jnp.zeros((bs, res[0], res[1], 3), jnp.float32)
    state = create_train_state(model, x, x, seed=0)
    params = state.params
    key = jax.random.key(0)

    prep = jax.jit(lambda h: preprocess_batch(
        h, stats, cfg.data.pipeline, cfg.data.lowres_scale))
    batch = prep(hr)
    inputs = batch["inputs"]
    timeit("preprocess_batch", lambda h: prep(h)["inputs"], hr)

    unet_fwd = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, train=False,
        method=lambda mdl, v, **kw: mdl.unet(v, **kw)))
    timeit("unet fwd", unet_fwd, params, inputs)

    prior_mu = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, method=lambda mdl, v: mdl.prior(v)).mu)
    timeit("prior fwd", prior_mu, params, inputs)

    # full sample(): UNet + prior + rsample + fcomb.ensemble
    sample = jax.jit(lambda p, a, k: model.apply(
        {"params": p}, a, num_samples=members,
        method=ProbabilisticUNet.sample, rngs={"latent": k}))
    timeit(f"sample() M={members}", sample, params, inputs, key)

    feats = unet_fwd(params, inputs)
    zs = jax.random.normal(key, (members, bs, 32), jnp.float32)
    dec = jax.jit(lambda p, f, z: model.apply(
        {"params": p}, f, z, method=ProbabilisticUNet.decode))
    timeit(f"fcomb.ensemble M={members}", dec, params, feats, zs)

    ens = dec(params, feats, zs)
    lri = jax.jit(lambda b: lrinterp_from_batch(
        b, cfg.data.lowres_scale, cfg.data.interp_mode))
    timeit("lrinterp_from_batch", lri, batch)
    lrinterp = lri(batch)
    r2h = jax.jit(lambda e, li: residual_to_hr(
        e, li[:, None], stats, cfg.data.pipeline, cfg.data.epsilon))
    timeit("residual_to_hr", r2h, ens, lrinterp)

    # the whole generation step exactly as bench.py BENCH_MODE=ensemble
    @jax.jit
    def gen(p, h, k):
        b = preprocess_batch(h, stats, cfg.data.pipeline,
                             cfg.data.lowres_scale)
        out = model.apply({"params": p}, b["inputs"], num_samples=members,
                          method=ProbabilisticUNet.sample,
                          rngs={"latent": k})
        li = lrinterp_from_batch(b, cfg.data.lowres_scale,
                                 cfg.data.interp_mode)
        return residual_to_hr(out, li[:, None], stats, cfg.data.pipeline,
                              cfg.data.epsilon)

    dt = timeit("FULL ensemble gen step", gen, params, hr, key)
    if dt:
        print(f"  -> {bs * members / dt:,.0f} member-fields/s")

    # eval path
    cfg.train.eval_ensemble_size = 5
    estep = make_eval_step(model, cfg)
    dt = timeit("FULL eval step (M=5)",
                lambda p, k, h: estep(p, k, h, stats)["loss"],
                params, key, hr)
    if dt:
        print(f"  -> {bs / dt:,.0f} samples/s")


if __name__ == "__main__":
    main()
