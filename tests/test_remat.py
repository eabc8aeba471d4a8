"""Gradient rematerialization: numerics identical, memory-for-compute knob."""

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.models.prob_unet import ProbabilisticUNet


def _model(remat):
    return ProbabilisticUNet(
        input_channels=3, num_classes=3, latent_dim=4,
        num_filters=(8, 16), model_channels=8, channel_mult=(1, 2),
        img_resolution=(32, 32), num_blocks=1, dropout=0.0, remat=remat,
    )


def test_remat_grads_match():
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    m0, m1 = _model(False), _model(True)
    params = jax.jit(m0.init)(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, x, x
    )["params"]

    def loss(model, p):
        total, _ = model.apply(
            {"params": p}, x, x, M=2, method=ProbabilisticUNet.elbo,
            rngs={"latent": jax.random.key(2), "dropout": jax.random.key(3)},
        )
        return total

    # identical parameter structure: remat is purely a recompute schedule
    g0 = jax.grad(lambda p: loss(m0, p))(params)
    g1 = jax.grad(lambda p: loss(m1, p))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


import pytest


@pytest.mark.parametrize("mode", ["save_convs", "save_convs_all"])
def test_save_convs_policy_remat_grads_match(mode):
    """remat="save_convs" (save conv outputs only; recompute the elementwise
    GN/FiLM/SiLU/dropout chains — and regenerate the dropout masks from the
    identical fold_in keys — in the backward pass) must produce the same
    gradients as no remat, WITH dropout active: the mask regenerated in the
    replay is bit-identical to the forward's. "save_convs_all" additionally
    wraps the Gaussian encoders (ReLU/pool chains recomputed)."""
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 32, 32, 3)), jnp.float32
    )

    def _dropout_model(remat):
        return ProbabilisticUNet(
            input_channels=3, num_classes=3, latent_dim=4,
            num_filters=(8, 16), model_channels=8, channel_mult=(1, 2),
            img_resolution=(32, 32), num_blocks=1, dropout=0.1, remat=remat,
        )

    m0, m1 = _dropout_model(False), _dropout_model(mode)
    params = jax.jit(m0.init)(
        {"params": jax.random.key(0), "latent": jax.random.key(1),
         "dropout": jax.random.key(2)}, x, x
    )["params"]

    def loss(model, p):
        total, _ = model.apply(
            {"params": p}, x, x, M=2, method=ProbabilisticUNet.elbo,
            rngs={"latent": jax.random.key(2), "dropout": jax.random.key(3)},
        )
        return total

    l0 = loss(m0, params)
    l1 = loss(m1, params)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=1e-6, atol=0)
    g0 = jax.grad(lambda p: loss(m0, p))(params)
    g1 = jax.grad(lambda p: loss(m1, p))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_selective_remat_levels_match():
    """remat=(0,) (checkpoint only level-0 blocks — the big-activation
    levels) must be a pure recompute-schedule change too: same param tree,
    same gradients as no remat."""
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    m0, m1 = _model(False), _model((0,))
    params = jax.jit(m0.init)(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, x, x
    )["params"]

    def loss(model, p):
        total, _ = model.apply(
            {"params": p}, x, x, M=2, method=ProbabilisticUNet.elbo,
            rngs={"latent": jax.random.key(2), "dropout": jax.random.key(3)},
        )
        return total

    g0 = jax.grad(lambda p: loss(m0, p))(params)
    g1 = jax.grad(lambda p: loss(m1, p))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
