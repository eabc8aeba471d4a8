"""Pallas kernels vs their XLA oracles (interpret mode on CPU).

Only kernels that WIN (or tie with a structural advantage) against XLA on
honest device timing live in ops.pallas — see its __init__ docstring for
the retired fcomb/groupnorm kernels' measurements.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probunet_tpu.ops.pallas import ensemble_crps_terms


def _terms_oracle(ens, tgt):
    e = jnp.asarray(ens, jnp.float32)
    t = jnp.asarray(tgt, jnp.float32)
    t1 = jnp.sum(jnp.abs(e - t[:, None, :]), axis=(1, 2))
    t2 = 0.5 * jnp.sum(
        jnp.abs(e[:, :, None, :] - e[:, None, :, :]), axis=(1, 2, 3)
    )
    return t1, t2


@pytest.mark.parametrize("m", [2, 5, 15])
@pytest.mark.parametrize("p", [300, 4096])
def test_terms_match_oracle(m, p):
    """Member padding (static slices) and lane padding both exact."""
    rng = np.random.default_rng(0)
    ens = jnp.asarray(rng.standard_normal((2, m, p)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, p)), jnp.float32)
    t1, t2 = ensemble_crps_terms(ens, tgt)
    t1r, t2r = _terms_oracle(ens, tgt)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t1r),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t2r),
                               rtol=1e-5, atol=1e-3)


def test_terms_grad_matches_oracle():
    """The analytic backward (sign sums via distance-d slicing) equals
    autodiff of the pairwise oracle — per-element, for both operands."""
    rng = np.random.default_rng(1)
    ens = jnp.asarray(rng.standard_normal((2, 7, 520)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, 520)), jnp.float32)

    def loss_k(e, t):
        a, b = ensemble_crps_terms(e, t)
        return (2.0 * a - 0.9 * b).sum()

    def loss_r(e, t):
        a, b = _terms_oracle(e, t)
        return (2.0 * a - 0.9 * b).sum()

    gk = jax.grad(loss_k, argnums=(0, 1))(ens, tgt)
    gr = jax.grad(loss_r, argnums=(0, 1))(ens, tgt)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                               rtol=1e-5, atol=1e-5)


def test_terms_bf16():
    rng = np.random.default_rng(2)
    ens = jnp.asarray(rng.standard_normal((2, 5, 400)), jnp.bfloat16)
    tgt = jnp.asarray(rng.standard_normal((2, 400)), jnp.bfloat16)
    t1, t2 = ensemble_crps_terms(ens, tgt)
    assert t1.dtype == jnp.float32  # f32 accumulation regardless of input
    t1r, t2r = _terms_oracle(ens, tgt)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t1r),
                               rtol=2e-2, atol=1e-1)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t2r),
                               rtol=2e-2, atol=1e-1)


def test_afcrps_loss_uses_kernel_when_forced(monkeypatch):
    """PROBUNET_CRPS_IMPL=pallas routes afcrps_loss through the kernel and
    the value matches the XLA implementation."""
    from probunet_tpu.ops import losses

    rng = np.random.default_rng(3)
    ens = jnp.asarray(rng.standard_normal((2, 5, 8, 8, 3)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    monkeypatch.setenv("PROBUNET_CRPS_IMPL", "pallas")
    v_kernel = float(losses.afcrps_loss(ens, tgt))
    monkeypatch.setenv("PROBUNET_CRPS_IMPL", "xla")
    v_xla = float(losses.afcrps_loss(ens, tgt))
    np.testing.assert_allclose(v_kernel, v_xla, rtol=1e-5)


# ---------------------------------------------------------------------------
# Fused fcomb-decode + CRPS kernel (ops/pallas/fcomb_crps.py)
# ---------------------------------------------------------------------------

class TestFusedFcombCrps:
    def _setup(self, b=2, h=8, w=12, c=16, d=8, k=3, m=5, seed=0):
        from probunet_tpu.models.fcomb import Fcomb

        fc = Fcomb(unet_output_channels=c, latent_dim=d, num_classes=k)
        feats = jax.random.normal(jax.random.key(seed + 1), (b, h, w, c))
        zs = jax.random.normal(jax.random.key(seed + 2), (m, b, d))
        tgt = jax.random.normal(jax.random.key(seed + 3), (b, h, w, k))
        params = fc.init({"params": jax.random.key(seed)}, feats, zs[0])[
            "params"]
        return fc, params, feats, zs, tgt

    @pytest.mark.parametrize("loss_type,m", [("afcrps", 2), ("afcrps", 5),
                                             ("crps", 5), ("afcrps", 15)])
    def test_fwd_matches_unfused(self, loss_type, m):
        from probunet_tpu.models.fcomb import Fcomb
        from probunet_tpu.ops.losses import afcrps_loss, crps_loss
        from probunet_tpu.ops.pallas.fcomb_crps import fused_fcomb_crps_loss

        fc, params, feats, zs, tgt = self._setup(m=m, seed=m)
        ens = fc.apply({"params": params}, feats, zs, method=Fcomb.ensemble)
        ref = (afcrps_loss(ens, tgt) if loss_type == "afcrps"
               else crps_loss(ens, tgt))
        got = fused_fcomb_crps_loss(feats, zs, params, tgt, loss_type,
                                    compute_dtype="float32")
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    def test_grads_match_unfused(self):
        from probunet_tpu.models.fcomb import Fcomb
        from probunet_tpu.ops.losses import afcrps_loss
        from probunet_tpu.ops.pallas.fcomb_crps import fused_fcomb_crps_loss

        fc, params, feats, zs, tgt = self._setup()

        def unfused(p, f, z, t):
            ens = fc.apply({"params": p}, f, z, method=Fcomb.ensemble)
            return afcrps_loss(ens, t)

        def fused(p, f, z, t):
            return fused_fcomb_crps_loss(f, z, p, t, "afcrps",
                                         compute_dtype="float32")

        g_ref = jax.grad(unfused, argnums=(0, 1, 2, 3))(params, feats, zs, tgt)
        g_new = jax.grad(fused, argnums=(0, 1, 2, 3))(params, feats, zs, tgt)
        for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_new)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-5, atol=2e-6)

    def test_bf16_close_to_f32(self):
        from probunet_tpu.ops.pallas.fcomb_crps import fused_fcomb_crps_loss

        _, params, feats, zs, tgt = self._setup(seed=7)
        f32 = float(fused_fcomb_crps_loss(feats, zs, params, tgt, "afcrps",
                                          compute_dtype="float32"))
        bf16 = float(fused_fcomb_crps_loss(feats, zs, params, tgt, "afcrps",
                                           compute_dtype="bfloat16"))
        assert abs(f32 - bf16) / abs(f32) < 0.05

    def test_nondivisible_pixels_masked(self):
        # P = 8*12 = 96 is not a multiple of the 2048 tile: the padded
        # region decodes to relu(z_part) != 0 and MUST be masked out
        from probunet_tpu.models.fcomb import Fcomb
        from probunet_tpu.ops.losses import afcrps_loss
        from probunet_tpu.ops.pallas.fcomb_crps import fused_fcomb_crps_loss

        fc, params, feats, zs, tgt = self._setup(h=5, w=7, seed=11)
        ens = fc.apply({"params": params}, feats, zs, method=Fcomb.ensemble)
        ref = float(afcrps_loss(ens, tgt))
        got = float(fused_fcomb_crps_loss(feats, zs, params, tgt, "afcrps",
                                          compute_dtype="float32"))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_elbo_fused_matches_unfused(self, monkeypatch):
        """The PROBUNET_FUSED_ELBO=1 path of ProbabilisticUNet.elbo equals
        the materialized-ensemble path (value and params-grad)."""
        from probunet_tpu.models.prob_unet import ProbabilisticUNet

        model = ProbabilisticUNet(
            input_channels=2, num_classes=2, latent_dim=4,
            num_filters=(8, 16), model_channels=16, channel_mult=(1, 2),
            img_resolution=(32, 32), num_blocks=1, dropout=0.0,
        )
        x = jax.random.normal(jax.random.key(0), (2, 32, 32, 2))
        y = jax.random.normal(jax.random.key(1), (2, 32, 32, 2))
        variables = model.init(
            {"params": jax.random.key(2), "latent": jax.random.key(3)}, x, y
        )

        def elbo(p, fused):
            monkeypatch.setenv("PROBUNET_FUSED_ELBO", "1" if fused else "0")
            total, metrics = model.apply(
                {"params": p}, x, y, M=3, loss_type="afcrps",
                beta_0=1.0, beta_1=0.1, training=True,
                method=ProbabilisticUNet.elbo,
                rngs={"latent": jax.random.key(4),
                      "dropout": jax.random.key(5)},
            )
            return total

        v_un = float(elbo(variables["params"], False))
        v_fu = float(elbo(variables["params"], True))
        np.testing.assert_allclose(v_fu, v_un, rtol=1e-5)

        g_un = jax.grad(lambda p: elbo(p, False))(variables["params"])
        g_fu = jax.grad(lambda p: elbo(p, True))(variables["params"])
        for a, b_ in zip(jax.tree.leaves(g_un), jax.tree.leaves(g_fu)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=5e-4, atol=1e-6)


class TestPallasDropout:
    """Zero-storage dropout kernel (ops/pallas/dropout.py — retired as a
    default with data, kept opt-in; reference nn.Dropout semantics,
    src/networks.py:176)."""

    def test_mask_semantics_and_bwd_regeneration(self):
        from probunet_tpu.ops.pallas.dropout import dropout, supported

        key = jax.random.key(3)
        seed2 = jax.random.key_data(key).ravel()[:2].astype(jnp.int32)
        y = jnp.ones((8, 16, 16, 32), jnp.bfloat16)
        assert supported(y.shape)
        out = jax.jit(lambda y, s: dropout(y, s, 0.10))(y, seed2)
        kept = float((out != 0).mean())
        assert 0.85 < kept < 0.95
        vals = {float(v) for v in np.unique(np.asarray(out, np.float32))}
        assert vals <= {0.0, float(jnp.bfloat16(1.0 / 0.9))}
        # backward regenerates the IDENTICAL mask from the seed: dx is
        # g/(1-p) exactly where the forward kept, 0 exactly where dropped
        g = jnp.full(y.shape, 2.0, jnp.bfloat16)
        _, vjp = jax.vjp(lambda y: dropout(y, seed2, 0.10), y)
        dx, = vjp(g)
        expect = np.where(np.asarray(out) != 0, 2.0 / 0.9, 0.0)
        np.testing.assert_allclose(np.asarray(dx, np.float32),
                                   expect.astype(np.float32), rtol=1e-2)

    def test_layer_opt_in(self, monkeypatch):
        from probunet_tpu.models import layers

        monkeypatch.setenv("PROBUNET_DROPOUT_IMPL", "pallas")
        key = jax.random.key(0)
        y = jnp.ones((4, 8, 8, 32), jnp.float32)
        out = layers._dropout(key, y, 0.25)
        kept = float((out != 0).mean())
        assert 0.60 < kept < 0.88
        # unsupported shape falls back to bernoulli
        out2 = layers._dropout(key, jnp.ones((3, 5, 5, 3)), 0.25)
        assert 0.4 < float((out2 != 0).mean()) < 1.0
