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
