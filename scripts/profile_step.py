"""Component-level timing of the flagship train step (honest host-read sync).

Times each piece of the ELBO step separately on the real TPU to locate the
bottleneck: UNet fwd, prior/posterior, fcomb ensemble decode, afCRPS loss,
full ELBO fwd, full train step (fwd+bwd+AdamW). Usage:

    python scripts/profile_step.py [bs] [M]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def timeit(name, fn, *args, n=10):
    try:
        out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out if not isinstance(out, tuple) else out[0])
        dt = (time.perf_counter() - t0) / n
    except Exception as e:  # keep profiling the remaining components
        print(f"{name:<28s}   FAILED ({type(e).__name__})")
        return None
    print(f"{name:<28s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    from probunet_tpu.config import preset
    from probunet_tpu.data.climex import compute_stats, preprocess_batch
    from probunet_tpu.data.synthetic import synthetic_climex_fields_device
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.ops.losses import afcrps_loss, afcrps_loss_pairwise
    from probunet_tpu.train.loop import make_train_step
    from probunet_tpu.train.state import create_train_state

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    cfg = preset("probunet_multivar_128")
    cfg.train.batch_size = bs
    cfg.train.ensemble_size = m
    cfg.model.compute_dtype = "bfloat16"

    res = cfg.data.resolution
    hr = synthetic_climex_fields_device(bs, res[0], res[1],
                                        cfg.data.variables, seed=0)
    stats = jax.jit(lambda a: compute_stats(a, cfg.data.lowres_scale))(hr)

    model = ProbabilisticUNet(
        img_resolution=res, dtype=jnp.bfloat16,
    )
    x = jnp.zeros((bs, res[0], res[1], 3), jnp.float32)
    state = create_train_state(model, x, x, seed=0)
    params = state.params

    batch = jax.jit(lambda h: preprocess_batch(
        h, stats, cfg.data.pipeline, cfg.data.lowres_scale))(hr)
    inputs, targets = batch["inputs"], batch["targets"]

    key = jax.random.key(0)

    # --- components ---
    unet_fwd = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, train=False,
        method=lambda mdl, v, **kw: mdl.unet(v, **kw)))
    timeit("unet fwd", unet_fwd, params, inputs)

    gauss = jax.jit(lambda p, a, t: model.apply(
        {"params": p}, a, t, method=ProbabilisticUNet.encode)[1].mu)
    timeit("unet+prior+posterior fwd", gauss, params, inputs, targets)

    feats = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, train=False,
        method=lambda mdl, v, **kw: mdl.unet(v, **kw)))(params, inputs)
    zs = jax.random.normal(key, (m, bs, 32), jnp.float32)
    # fused fcomb-decode + CRPS kernel (ops/pallas/fcomb_crps.py)
    from probunet_tpu.ops.pallas.fcomb_crps import fused_fcomb_crps_loss

    fc_params = {k: v for k, v in params["fcomb"].items()}
    zsf = jnp.swapaxes(zs, 0, 1) if zs.shape[0] == bs else zs  # (M, B, D)
    fused_fwd = jax.jit(lambda f, z, t: fused_fcomb_crps_loss(
        f, z, fc_params, t, "afcrps", compute_dtype="bfloat16"))
    timeit("fused fcomb+afcrps fwd", fused_fwd, feats, zsf, targets)
    fused_grad = jax.jit(jax.grad(lambda f, z, t: fused_fcomb_crps_loss(
        f, z, fc_params, t, "afcrps", compute_dtype="bfloat16")))
    timeit("fused fcomb+afcrps grad", fused_grad, feats, zsf, targets)

    prep = jax.jit(lambda h: preprocess_batch(
        h, stats, cfg.data.pipeline, cfg.data.lowres_scale)["targets"])
    timeit("preprocess_batch", prep, hr)

    def elbo_fwd(p, h, k):
        b = preprocess_batch(h, stats, cfg.data.pipeline,
                             cfg.data.lowres_scale)
        total, _ = model.apply(
            {"params": p}, b["inputs"], b["targets"], M=m,
            loss_type="afcrps", training=True,
            method=ProbabilisticUNet.elbo,
            rngs={"latent": k, "dropout": jax.random.fold_in(k, 1)},
        )
        return total

    elbo_j = jax.jit(elbo_fwd)
    timeit("full elbo fwd", elbo_j, params, hr, key)

    grad_j = jax.jit(jax.grad(elbo_fwd))
    timeit("elbo grad (fwd+bwd)", lambda p, h, k: jax.tree.leaves(
        grad_j(p, h, k))[0], params, hr, key)

    step = make_train_step(model, cfg, donate=False)
    b0, b1 = jnp.float32(1.0), jnp.float32(1e-3)
    timeit("full train step", lambda s, h: step(s, h, stats, b0, b1)[1][
        "grad_norm"], state, hr)

    # unfused fcomb decode + loss — OFF the training path since the fused
    # kernel (ops/pallas/fcomb_crps.py); timed last because its peak HBM at
    # bs=128 can exhaust the chip and poison subsequent dispatches
    fcomb_dec = jax.jit(lambda p, f, z: model.apply(
        {"params": p}, f, z, method=ProbabilisticUNet.decode))
    timeit("fcomb ensemble decode", fcomb_dec, params, feats, zs)

    try:
        ens = fcomb_dec(params, feats, zs)
        ens = jnp.swapaxes(ens, 0, 1) if ens.shape[0] == m else ens
        loss_sorted = jax.jit(lambda e, t: afcrps_loss(e, t))
        timeit("afcrps (sorted form)", loss_sorted, ens, targets)
        loss_pair = jax.jit(lambda e, t: afcrps_loss_pairwise(e, t))
        timeit("afcrps (pairwise form)", loss_pair, ens, targets)
        del ens
    except Exception as e:
        print(f"unfused afcrps timings skipped ({type(e).__name__})")


if __name__ == "__main__":
    main()
