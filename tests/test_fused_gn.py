"""Fused GN->FiLM->SiLU->dropout Pallas kernel vs the XLA composition.

Runs the kernel in interpret mode on CPU (numerics-identical to the TPU
lowering) and checks forward parity, every analytic gradient against
autodiff of the reference composition, dropout mask semantics (fwd/bwd
consistency, rate, determinism), and the EDMGroupNorm module dispatch.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probunet_tpu.ops.pallas.fused_gn import (
    _pack_factor, gn_film_silu_dropout, supported,
)

SHAPES = [  # (H, W, C, groups) — k = 4, 2, 1 pack factors
    (8, 8, 32, 8),
    (8, 8, 64, 16),
    (4, 4, 128, 32),
]


def _compose(x, gamma, beta, scale, shift, groups, eps, silu, mask=None,
             p=0.0):
    """Reference XLA composition (flax GroupNorm fast-variance semantics)."""
    b, h, w, c = x.shape
    xg = x.reshape(b, h * w, groups, c // groups).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = (xg * xg).mean(axis=(1, 3), keepdims=True) - mean**2
    xhat = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = xhat * gamma + beta
    y = y * (scale[:, None, None, :] + 1) + shift[:, None, None, :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    if mask is not None:
        y = jnp.where(mask, y / (1 - p), 0.0)
    return y


def _args(h, w, c, seed=0, dtype=jnp.float32, bsz=3):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((bsz, h, w, c)), dtype)
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    scale = jnp.asarray(0.2 * rng.standard_normal((bsz, c)), jnp.float32)
    shift = jnp.asarray(0.2 * rng.standard_normal((bsz, c)), jnp.float32)
    return x, gamma, beta, scale, shift


@pytest.mark.parametrize("h,w,c,groups", SHAPES)
@pytest.mark.parametrize("silu", [True, False])
def test_forward_parity(h, w, c, groups, silu):
    x, gamma, beta, scale, shift = _args(h, w, c)
    seed2 = jnp.zeros((2,), jnp.int32)
    y = gn_film_silu_dropout(x, gamma, beta, scale, shift, seed2,
                             groups, 1e-5, 0.0, silu)
    ref = _compose(x, gamma, beta, scale, shift, groups, 1e-5, silu)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_plain_gn_silu_zero_film():
    """film=(0,0) must reduce to GN(+affine)+SiLU exactly."""
    h, w, c, groups = SHAPES[0]
    x, gamma, beta, _, _ = _args(h, w, c)
    z = jnp.zeros((x.shape[0], c), jnp.float32)
    seed2 = jnp.zeros((2,), jnp.int32)
    y = gn_film_silu_dropout(x, gamma, beta, z, z, seed2,
                             groups, 1e-5, 0.0, True)
    ref = _compose(x, gamma, beta, z, z, groups, 1e-5, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("h,w,c,groups", SHAPES)
def test_gradients(h, w, c, groups):
    x, gamma, beta, scale, shift = _args(h, w, c, seed=1)
    seed2 = jnp.zeros((2,), jnp.int32)
    cot = jnp.asarray(
        np.random.default_rng(2).standard_normal(x.shape), jnp.float32)

    def f_kernel(x, gamma, beta, scale, shift):
        y = gn_film_silu_dropout(x, gamma, beta, scale, shift, seed2,
                                 groups, 1e-5, 0.0, True)
        return jnp.sum(y * cot)

    def f_ref(x, gamma, beta, scale, shift):
        return jnp.sum(
            _compose(x, gamma, beta, scale, shift, groups, 1e-5, True) * cot)

    gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, scale, shift)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, scale, shift)
    for a, b, name in zip(gk, gr, ["x", "gamma", "beta", "scale", "shift"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad wrt {name}")


def test_bf16_close():
    h, w, c, groups = SHAPES[0]
    x, gamma, beta, scale, shift = _args(h, w, c, dtype=jnp.bfloat16)
    seed2 = jnp.zeros((2,), jnp.int32)
    y = gn_film_silu_dropout(x, gamma, beta, scale, shift, seed2,
                             groups, 1e-5, 0.0, True)
    assert y.dtype == jnp.bfloat16
    ref = _compose(x.astype(jnp.float32), gamma, beta, scale, shift,
                   groups, 1e-5, True)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_dropout_semantics():
    h, w, c, groups = SHAPES[0]
    p = 0.4
    x, gamma, beta, scale, shift = _args(h, w, c, seed=3, bsz=4)
    seed2 = jnp.asarray([17, 23], jnp.int32)
    zero = jnp.zeros((2,), jnp.int32)
    y = gn_film_silu_dropout(x, gamma, beta, scale, shift, seed2,
                             groups, 1e-5, p, True)
    y_nodrop = gn_film_silu_dropout(x, gamma, beta, scale, shift, zero,
                                    groups, 1e-5, 0.0, True)
    mask = np.asarray(y) != 0.0
    # kept entries are exactly y_nodrop / (1-p)
    np.testing.assert_allclose(
        np.asarray(y)[mask], (np.asarray(y_nodrop) / (1 - p))[mask],
        rtol=1e-5)
    # keep rate within 4 sigma
    rate = mask.mean()
    sigma = np.sqrt(p * (1 - p) / mask.size)
    assert abs(rate - (1 - p)) < 4 * sigma, rate

    # determinism + seed sensitivity
    y2 = gn_film_silu_dropout(x, gamma, beta, scale, shift, seed2,
                              groups, 1e-5, p, True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    y3 = gn_film_silu_dropout(x, gamma, beta, scale, shift,
                              jnp.asarray([99, 1], jnp.int32),
                              groups, 1e-5, p, True)
    assert (np.asarray(y3) != np.asarray(y)).any()

    # backward regenerates the identical mask: grads match autodiff of the
    # composition evaluated with the mask extracted from the forward
    cot = jnp.asarray(
        np.random.default_rng(4).standard_normal(x.shape), jnp.float32)

    def f_kernel(x, gamma, beta, scale, shift):
        return jnp.sum(gn_film_silu_dropout(
            x, gamma, beta, scale, shift, seed2, groups, 1e-5, p, True) * cot)

    def f_ref(x, gamma, beta, scale, shift):
        return jnp.sum(_compose(x, gamma, beta, scale, shift, groups, 1e-5,
                                True, mask=jnp.asarray(mask), p=p) * cot)

    gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, scale, shift)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, scale, shift)
    for a, b, name in zip(gk, gr, ["x", "gamma", "beta", "scale", "shift"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad wrt {name}")


def test_pack_factor_and_supported():
    assert _pack_factor(64, 32) == 4
    assert _pack_factor(64, 64) == 2
    assert _pack_factor(16, 128) == 1
    assert _pack_factor(16384, 96) == 4      # decoder concat width
    assert _pack_factor(6, 32) is None       # rows not sublane-aligned
    assert supported(128, 128, 32, 8)
    assert not supported(3, 2, 32, 8)


def test_module_dispatch_parity():
    """EDMGroupNorm pallas path == xla path (params shared, p=0)."""
    from probunet_tpu.models.layers import EDMGroupNorm

    h, w, c, groups = SHAPES[0]
    x, *_ = _args(h, w, c)
    scale = jnp.asarray(
        0.2 * np.random.default_rng(5).standard_normal((x.shape[0], c)),
        jnp.float32)
    shift = scale * 0.5
    mod = EDMGroupNorm()
    params = mod.init(jax.random.key(0), x)

    def run(impl):
        os.environ["PROBUNET_GN_IMPL"] = impl
        try:
            return mod.apply(params, x, silu=True, film=(scale, shift))
        finally:
            del os.environ["PROBUNET_GN_IMPL"]

    np.testing.assert_allclose(np.asarray(run("pallas")),
                               np.asarray(run("xla")),
                               rtol=2e-5, atol=2e-5)


def test_unet_block_fused_matches_xla():
    """Whole UNetBlock under both impls (dropout 0 for exactness)."""
    from probunet_tpu.models.layers import INIT_EDM, INIT_ZERO, UNetBlock

    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 8, 8, 32), jnp.float32)
    emb = jax.random.normal(jax.random.key(1), (2, 16), jnp.float32)
    blk = UNetBlock(out_channels=32, dropout=0.0, init=INIT_EDM,
                    init_zero=INIT_ZERO)

    import flax.linen as nn

    def run(impl):
        os.environ["PROBUNET_GN_IMPL"] = impl
        try:
            # UNetBlock's `init` field shadows Module.init — use it unbound
            params = nn.Module.init(blk, {"params": key}, x, emb, False)
            return params, blk.apply(params, x, emb, False)
        finally:
            del os.environ["PROBUNET_GN_IMPL"]

    p_pl, y_pl = run("pallas")
    p_xla, y_xla = run("xla")
    # identical param trees regardless of impl
    assert jax.tree.structure(p_pl) == jax.tree.structure(p_xla)
    y_cross = blk.apply(p_xla, x, emb, False)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_cross), np.asarray(y_xla),
                               rtol=2e-5, atol=2e-5)
