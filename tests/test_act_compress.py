"""int8 saved-activation compression (ops/act_compress.py, VERDICT r4 #4).

The contract is sharp and testable: forward bit-identical to the float
conv, dx bit-exact (bilinear — never reads the stored input), dW equal to
the float dW computed at the int8-roundtripped input (error bounded by the
per-channel scale). The full-model test asserts the ELBO value is
UNCHANGED and the weight grads stay within a small relative error.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probunet_tpu.ops.act_compress import (
    _plain_conv, _quantize_channels, act8_conv,
)


@pytest.fixture
def act8_env():
    os.environ["PROBUNET_ACT_COMPRESS"] = "int8"
    yield
    os.environ.pop("PROBUNET_ACT_COMPRESS", None)


class TestPrimitive:
    def test_forward_identical(self):
        kx, kw = jax.random.split(jax.random.key(0))
        x = jax.random.normal(kx, (2, 16, 16, 8))
        w = jax.random.normal(kw, (3, 3, 8, 16)) * 0.1
        y = act8_conv(x, w, 1, jnp.float32)
        y_f = _plain_conv(x, w, 1, jnp.float32)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y_f))

    def test_dx_exact_dw_approx(self):
        kx, kw, kg = jax.random.split(jax.random.key(1), 3)
        x = jax.random.normal(kx, (2, 16, 16, 8))
        w = jax.random.normal(kw, (3, 3, 8, 16)) * 0.1
        g = jax.random.normal(kg, (2, 16, 16, 16))

        def loss_c(x, w):
            return jnp.vdot(act8_conv(x, w, 1, jnp.float32), g)

        def loss_f(x, w):
            return jnp.vdot(_plain_conv(x, w, 1, jnp.float32), g)

        dx_c, dw_c = jax.grad(loss_c, argnums=(0, 1))(x, w)
        dx_f, dw_f = jax.grad(loss_f, argnums=(0, 1))(x, w)
        # dx = g (*) w^T never touches the stored input -> bit-exact
        np.testing.assert_array_equal(np.asarray(dx_c), np.asarray(dx_f))
        # dW uses the int8-roundtripped input: equal to the float dW at
        # dequant(q, s) exactly, and close to the true dW
        q, s = _quantize_channels(x)
        xh = (q.astype(jnp.float32) * s)
        dw_ref = jax.grad(loss_f, argnums=1)(xh, w)
        np.testing.assert_allclose(np.asarray(dw_c), np.asarray(dw_ref),
                                   rtol=1e-5, atol=1e-5)
        rel = float(jnp.linalg.norm(dw_c - dw_f) / jnp.linalg.norm(dw_f))
        assert rel < 0.02, rel

    def test_quantize_error_bound(self):
        x = jax.random.normal(jax.random.key(2), (4, 8, 8, 16)) * 5.0
        q, s = _quantize_channels(x)
        err = np.abs(np.asarray(q, np.float32) * np.asarray(s)
                     - np.asarray(x))
        assert (err <= np.asarray(s) / 2 + 1e-6).all()


class TestModelIntegration:
    def test_elbo_value_unchanged_grads_close(self, act8_env):
        from probunet_tpu.config import Config
        from probunet_tpu.data.climex import compute_stats
        from probunet_tpu.models.prob_unet import ProbabilisticUNet
        from probunet_tpu.train.loop import make_elbo_loss_fn

        cfg = Config()
        cfg.data.resolution = (32, 32)
        cfg.data.lowres_scale = 4
        cfg.model.latent_dim = 4
        cfg.model.num_filters = (8, 16)
        cfg.model.model_channels = 8
        cfg.model.channel_mult = (1, 2)
        cfg.model.num_blocks = 1
        cfg.train.ensemble_size = 3

        model = ProbabilisticUNet(
            input_channels=3, num_classes=3, latent_dim=4,
            num_filters=(8, 16), model_channels=8, channel_mult=(1, 2),
            img_resolution=(32, 32), num_blocks=1,
        )
        rng = np.random.default_rng(0)
        hr = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
        stats = compute_stats(hr, 4)
        x = jnp.zeros((4, 32, 32, 3), jnp.float32)
        params = model.init(
            {"params": jax.random.key(0), "latent": jax.random.key(1)}, x, x
        )["params"]
        loss_fn = make_elbo_loss_fn(model, cfg)

        def total(p):
            t, _ = loss_fn(p, jax.random.key(3), hr, stats,
                           jnp.float32(1.0), jnp.float32(0.1))
            return t

        loss_c, g_c = jax.value_and_grad(total)(params)
        os.environ.pop("PROBUNET_ACT_COMPRESS", None)
        loss_f, g_f = jax.value_and_grad(total)(params)
        os.environ["PROBUNET_ACT_COMPRESS"] = "int8"

        # forward path untouched -> identical ELBO
        assert float(loss_c) == pytest.approx(float(loss_f), rel=1e-6)
        # weight grads: small relative error, no zeros introduced
        num = sum(float(jnp.vdot(a - b, a - b).real)
                  for a, b in zip(jax.tree.leaves(g_c), jax.tree.leaves(g_f)))
        den = sum(float(jnp.vdot(b, b).real) for b in jax.tree.leaves(g_f))
        rel = (num / max(den, 1e-12)) ** 0.5
        assert rel < 0.05, rel
