"""Gradient-component timing: where do the 830ms of backward go? (bs=64)"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def sync(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<34s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def first_leaf(tree):
    return jax.tree.leaves(tree)[0]


def main():
    from probunet_tpu.config import preset
    from probunet_tpu.data.climex import compute_stats, preprocess_batch
    from probunet_tpu.data.synthetic import synthetic_climex_fields_device
    from probunet_tpu.models.prob_unet import ProbabilisticUNet
    from probunet_tpu.ops.losses import afcrps_loss, afcrps_loss_pairwise
    from probunet_tpu.train.state import create_train_state

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    cfg = preset("probunet_multivar_128")
    res = cfg.data.resolution
    hr = synthetic_climex_fields_device(bs, res[0], res[1],
                                        cfg.data.variables, seed=0)
    stats = jax.jit(lambda a: compute_stats(a, cfg.data.lowres_scale))(hr)

    model = ProbabilisticUNet(img_resolution=res, dtype=jnp.bfloat16)
    x = jnp.zeros((bs, res[0], res[1], 3), jnp.float32)
    state = create_train_state(model, x, x, seed=0)
    params = state.params

    batch = jax.jit(lambda h: preprocess_batch(
        h, stats, cfg.data.pipeline, cfg.data.lowres_scale))(hr)
    inputs, targets = batch["inputs"], batch["targets"]
    key = jax.random.key(0)

    # unet grad (dropout ON like training)
    def unet_loss(p, a, k):
        out = model.apply({"params": p}, a, train=True,
                          method=lambda mdl, v, **kw: mdl.unet(v, **kw),
                          rngs={"dropout": k})
        return (out.astype(jnp.float32) ** 2).mean()

    g = jax.jit(lambda p, a, k: first_leaf(jax.grad(unet_loss)(p, a, k)))
    timeit("unet grad (dropout on)", g, params, inputs, key)

    def unet_loss_nodrop(p, a):
        out = model.apply({"params": p}, a, train=False,
                          method=lambda mdl, v, **kw: mdl.unet(v, **kw))
        return (out.astype(jnp.float32) ** 2).mean()

    g = jax.jit(lambda p, a: first_leaf(jax.grad(unet_loss_nodrop)(p, a)))
    timeit("unet grad (dropout off)", g, params, inputs)

    # prior+posterior grad
    def gauss_loss(p, a, t):
        feats, prior, post = model.apply({"params": p}, a, t,
                                         method=ProbabilisticUNet.encode)
        return (prior.mu ** 2).mean() + (post.mu ** 2).mean()

    g = jax.jit(lambda p, a, t: first_leaf(jax.grad(gauss_loss)(p, a, t)))
    timeit("unet+prior+post grad", g, params, inputs, targets)

    # fcomb ensemble grad (frozen feats)
    feats = jax.jit(lambda p, a: model.apply(
        {"params": p}, a, train=False,
        method=lambda mdl, v, **kw: mdl.unet(v, **kw)))(params, inputs)
    zs = jax.random.normal(key, (m, bs, 32), jnp.float32)

    def fcomb_loss(p, f, z):
        out = model.apply({"params": p}, f, z,
                          method=ProbabilisticUNet.decode)
        return (out.astype(jnp.float32) ** 2).mean()

    g = jax.jit(lambda p, f, z: first_leaf(jax.grad(fcomb_loss)(p, f, z)))
    timeit("fcomb ensemble grad", g, params, feats, zs)

    # loss grads on a fixed ensemble
    ens = jax.jit(lambda p, f, z: jnp.swapaxes(model.apply(
        {"params": p}, f, z, method=ProbabilisticUNet.decode), 0, 1)
        if False else model.apply({"params": p}, f, z,
                                  method=ProbabilisticUNet.decode))(
        params, feats, zs)

    g = jax.jit(jax.grad(lambda e: afcrps_loss(e, targets)))
    timeit("afcrps grad (sorted)", g, ens)
    g = jax.jit(jax.grad(lambda e: afcrps_loss_pairwise(e, targets)))
    timeit("afcrps grad (pairwise)", g, ens)


if __name__ == "__main__":
    main()
