"""EDM diffusion: loss decreases, sampler produces conditioned fields."""

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.config import Config
from probunet_tpu.data.climex import compute_stats
from probunet_tpu.models.edm import EDMPrecond
from probunet_tpu.train.edm import (
    edm_ensemble,
    edm_loss,
    edm_sample,
    make_edm_train_step,
)
def tiny_edm(res=16, cin=3):
    return EDMPrecond(
        img_resolution=(res, res), in_channels=cin, out_channels=3,
        model_channels=8, channel_mult=(1, 2), num_blocks=1, dropout=0.0,
    )


def init_params(model, res=16):
    x = jnp.zeros((2, res, res, 3), jnp.float32)
    cond = jnp.zeros((2, res, res, 3), jnp.float32)
    return jax.jit(model.init)(
        jax.random.key(0), x, jnp.ones((2,)), condition_img=cond
    )["params"]


def test_edm_loss_finite_and_grad():
    model = tiny_edm()
    params = init_params(model)
    rng = jax.random.key(1)
    y = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 3)),
                    jnp.float32)
    cond = y * 0.5
    loss = edm_loss(model, params, rng, y, cond)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: edm_loss(model, p, rng, y, cond))(params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_edm_train_step_decreases_loss():
    cfg = Config()
    cfg.data.resolution = (16, 16)
    cfg.data.lowres_scale = 4
    cfg.train.batch_size = 8

    model = tiny_edm()
    # condition is `inputs` (= lrinterp_stand, 3 channels)
    params = init_params(model)
    rng = np.random.default_rng(1)
    hr_stack = jnp.asarray(rng.standard_normal((16, 16, 16, 3)), jnp.float32)
    stats = compute_stats(hr_stack, 4)
    hr = jnp.asarray(hr_stack[:8])

    from probunet_tpu.train.state import TrainState, make_optimizer
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=make_optimizer(1e-3), rng=jax.random.key(0),
    )
    step = make_edm_train_step(model, cfg, donate=False)

    # fixed-key eval loss: per-step training losses are noisy in the random
    # sigma draw, so compare the SAME eval before and after training
    from probunet_tpu.data.climex import preprocess_batch
    batch = preprocess_batch(hr, stats, cfg.data.pipeline,
                             cfg.data.lowres_scale)
    eval_key = jax.random.key(99)
    before = float(edm_loss(model, state.params, eval_key, batch["targets"],
                            batch["inputs"], train=False))
    for _ in range(10):
        state, m = step(state, hr, stats)
        assert np.isfinite(float(m["loss"]))
    after = float(edm_loss(model, state.params, eval_key, batch["targets"],
                           batch["inputs"], train=False))
    assert after < before


def test_edm_sampler_and_ensemble():
    model = tiny_edm()
    params = init_params(model)
    cond = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 16, 16, 3)), jnp.float32
    )
    out = edm_sample(model, params, jax.random.key(3), (2, 16, 16, 3),
                     condition=cond, num_steps=4)
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))

    ens = edm_ensemble(model, params, jax.random.key(4), (2, 16, 16, 3),
                       cond, num_members=3, num_steps=3)
    assert ens.shape == (2, 3, 16, 16, 3)
    # different members differ (stochastic initial noise)
    assert float(jnp.abs(ens[:, 0] - ens[:, 1]).max()) > 1e-6
