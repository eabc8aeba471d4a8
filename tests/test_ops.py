"""Unit tests for probunet_tpu.ops — losses, distributions, resampling,
transforms — validated against closed forms and independent oracles
(torch.distributions, scipy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from probunet_tpu.data import transforms
from probunet_tpu.ops import (
    afcrps_loss,
    afcrps_loss_pairwise,
    avg_pool,
    crps_empirical,
    crps_loss,
    crps_loss_pairwise,
    upsample_bilinear,
    upsample_nearest,
    wmse_ms_ssim_loss,
    wmse_weights,
)
from probunet_tpu.ops.distributions import (
    DiagGaussian,
    kl_diag_gaussians,
    kl_to_standard_normal,
)
from probunet_tpu.ops.msssim import ms_ssim, ssim


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

class TestTransforms:
    def test_softplus_roundtrip(self):
        x = jnp.linspace(0.05, 30.0, 100)
        y = transforms.softplus(transforms.softplus_inv(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4)

    def test_softplus_inv_matches_torch_formula(self):
        import torch

        x = np.abs(np.random.default_rng(0).normal(2, 3, 50)).astype(np.float32)
        ours = np.asarray(transforms.softplus_inv(jnp.asarray(x)))
        # independent torch evaluation of the reference's masked formula
        t = torch.tensor(x.copy())
        mask = t > 20.0
        t[~mask] = torch.log(torch.exp(t[~mask] + 1e-7) - 1.0)
        np.testing.assert_allclose(ours, t.numpy(), rtol=1e-4, atol=1e-5)

    def test_identity_above_threshold(self):
        x = jnp.asarray([25.0, 100.0])
        np.testing.assert_allclose(np.asarray(transforms.softplus(x)), np.asarray(x))
        np.testing.assert_allclose(np.asarray(transforms.softplus_inv(x)), np.asarray(x))

    def test_physical_transform_roundtrip(self):
        rng = np.random.default_rng(1)
        hr = np.stack(
            [
                np.abs(rng.normal(3, 2, (4, 8, 8))),       # pr >= 0
                rng.normal(5, 3, (4, 8, 8)),               # tasmin
                rng.normal(12, 3, (4, 8, 8)),              # tasmax
            ],
            axis=-1,
        ).astype(np.float32)
        hr[..., 2] = hr[..., 1] + np.abs(hr[..., 2] - hr[..., 1]) + 0.1  # tmax > tmin
        stored = transforms.apply_physical_transform(jnp.asarray(hr))
        back = transforms.invert_physical_transform(stored)
        np.testing.assert_allclose(np.asarray(back), hr, rtol=1e-3, atol=1e-3)
        # decoded pr must be nonnegative, tasmax > tasmin for ANY stored value
        noisy = np.asarray(stored) + rng.normal(0, 5, stored.shape).astype(np.float32)
        dec = np.asarray(transforms.invert_physical_transform(jnp.asarray(noisy)))
        assert (dec[..., 0] >= 0).all()
        assert (dec[..., 2] >= dec[..., 1]).all()

    def test_units(self):
        assert float(transforms.kgm2s_to_mmday(jnp.asarray(1.0 / 86400.0))) == pytest.approx(1.0)
        assert float(transforms.k_to_c(jnp.asarray(273.15))) == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# resample
# ---------------------------------------------------------------------------

class TestResample:
    def test_avg_pool_matches_torch(self):
        import torch

        x = np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32)
        ours = np.asarray(avg_pool(jnp.asarray(x), 4))
        ref = torch.nn.AvgPool2d(4)(torch.tensor(x).permute(0, 3, 1, 2))
        np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-6)

    def test_upsample_nearest_matches_torch(self):
        import torch

        x = np.random.default_rng(1).normal(size=(2, 4, 4, 3)).astype(np.float32)
        ours = np.asarray(upsample_nearest(jnp.asarray(x), 4))
        ref = torch.nn.functional.interpolate(
            torch.tensor(x).permute(0, 3, 1, 2), scale_factor=4
        )  # torch default mode == nearest, as in reference climex_utils.py:204
        np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-6)

    def test_upsample_bilinear_matches_torch(self):
        import torch

        x = np.random.default_rng(2).normal(size=(2, 8, 8, 1)).astype(np.float32)
        ours = np.asarray(upsample_bilinear(jnp.asarray(x), 2))
        ref = torch.nn.functional.interpolate(
            torch.tensor(x).permute(0, 3, 1, 2), scale_factor=2, mode="bilinear",
            align_corners=False,
        )
        np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5)

    def test_pool_upsample_shapes(self):
        x = jnp.zeros((2, 128, 128, 3))
        assert avg_pool(x, 16).shape == (2, 8, 8, 3)
        assert upsample_nearest(avg_pool(x, 16), 16).shape == x.shape


# ---------------------------------------------------------------------------
# distributions
# ---------------------------------------------------------------------------

class TestDiagGaussian:
    def _random_dist(self, key, b=4, d=6):
        k1, k2 = jax.random.split(key)
        return DiagGaussian(
            mu=jax.random.normal(k1, (b, d)),
            log_sigma=0.3 * jax.random.normal(k2, (b, d)),
        )

    def test_kl_matches_torch_distributions(self):
        import torch
        from torch.distributions import Independent, Normal, kl_divergence

        q = self._random_dist(jax.random.key(0))
        p = self._random_dist(jax.random.key(1))
        ours = np.asarray(kl_diag_gaussians(q, p))

        tq = Independent(
            Normal(torch.tensor(np.asarray(q.mu)), torch.tensor(np.asarray(q.sigma))), 1
        )
        tp = Independent(
            Normal(torch.tensor(np.asarray(p.mu)), torch.tensor(np.asarray(p.sigma))), 1
        )
        ref = kl_divergence(tq, tp).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_kl_self_zero(self):
        q = self._random_dist(jax.random.key(2))
        np.testing.assert_allclose(np.asarray(kl_diag_gaussians(q, q)), 0.0, atol=1e-6)

    def test_kl_standard(self):
        q = self._random_dist(jax.random.key(3))
        std = DiagGaussian(jnp.zeros_like(q.mu), jnp.full_like(q.log_sigma, -20.0))
        # direct standard-normal formula vs general formula with sigma ~= 1
        direct = np.asarray(kl_to_standard_normal(q))
        p = DiagGaussian(jnp.zeros_like(q.mu), jnp.log(1.0 - 1e-7) * jnp.ones_like(q.log_sigma))
        general = np.asarray(kl_diag_gaussians(q, p))
        np.testing.assert_allclose(direct, general, rtol=1e-4)

    def test_rsample_statistics(self):
        d = DiagGaussian(mu=jnp.asarray([[1.0, -2.0]]), log_sigma=jnp.asarray([[0.0, 1.0]]))
        s = d.rsample(jax.random.key(0), sample_shape=(20000,))
        mean = np.asarray(s.mean(axis=0))[0]
        std = np.asarray(s.std(axis=0))[0]
        np.testing.assert_allclose(mean, [1.0, -2.0], atol=0.05)
        np.testing.assert_allclose(std, [1.0, np.e], rtol=0.03)

    def test_log_prob_matches_torch(self):
        import torch
        from torch.distributions import Independent, Normal

        q = self._random_dist(jax.random.key(4))
        x = jax.random.normal(jax.random.key(5), q.mu.shape)
        ours = np.asarray(q.log_prob(x))
        tq = Independent(
            Normal(torch.tensor(np.asarray(q.mu)), torch.tensor(np.asarray(q.sigma))), 1
        )
        ref = tq.log_prob(torch.tensor(np.asarray(x))).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# CRPS family
# ---------------------------------------------------------------------------

class TestCRPS:
    def _ens(self, key, b=3, m=7, c=2, h=8, w=8):
        k1, k2 = jax.random.split(key)
        ens = jax.random.normal(k1, (b, m, h, w, c))
        tgt = jax.random.normal(k2, (b, h, w, c))
        return ens, tgt

    def test_afcrps_sorted_equals_pairwise(self):
        ens, tgt = self._ens(jax.random.key(0))
        fast = float(afcrps_loss(ens, tgt, alpha=0.95))
        slow = float(afcrps_loss_pairwise(ens, tgt, alpha=0.95))
        assert fast == pytest.approx(slow, rel=1e-5)

    def test_afcrps_alpha_variants(self):
        ens, tgt = self._ens(jax.random.key(1))
        for alpha in (0.5, 0.9, 1.0):
            fast = float(afcrps_loss(ens, tgt, alpha=alpha))
            slow = float(afcrps_loss_pairwise(ens, tgt, alpha=alpha))
            assert fast == pytest.approx(slow, rel=1e-5)

    def test_crps_sorted_equals_pairwise(self):
        ens, tgt = self._ens(jax.random.key(2))
        assert float(crps_loss(ens, tgt)) == pytest.approx(
            float(crps_loss_pairwise(ens, tgt)), rel=1e-5
        )

    def test_crps_perfect_forecast(self):
        # all members equal to target -> CRPS = 0
        tgt = jax.random.normal(jax.random.key(3), (2, 4, 4, 1))
        ens = jnp.broadcast_to(tgt[:, None], (2, 5, 4, 4, 1))
        assert float(crps_loss(ens, tgt)) == pytest.approx(0.0, abs=1e-6)

    def test_afcrps_m2_requires(self):
        tgt = jnp.zeros((1, 4, 4, 1))
        with pytest.raises(ValueError):
            afcrps_loss(jnp.zeros((1, 1, 4, 4, 1)), tgt)

    def test_crps_empirical_matches_pairwise_form(self):
        # pyro's sorted formula == E|x-y| - 0.5 E|x-x'| computed directly
        key = jax.random.key(4)
        pred = jax.random.normal(key, (9, 5, 5))
        truth = jax.random.normal(jax.random.key(5), (5, 5))
        ours = np.asarray(crps_empirical(pred, truth))
        p = np.asarray(pred)
        direct = np.abs(p - np.asarray(truth)).mean(0) - 0.5 * np.abs(
            p[:, None] - p[None, :]
        ).mean((0, 1))
        np.testing.assert_allclose(ours, direct, rtol=1e-4, atol=1e-6)

    def test_crps_empirical_single_sample_is_mae(self):
        pred = jnp.asarray([[[1.0, 2.0]]])
        truth = jnp.asarray([[0.5, 3.0]])
        np.testing.assert_allclose(
            np.asarray(crps_empirical(pred, truth)), [[0.5, 1.0]]
        )

    def test_crps_ensemble_consistency(self):
        # afCRPS with alpha=1 (eps=0) should be the fair CRPS:
        # fair CRPS = E|x-y| - 1/(2M(M-1)) sum_{j!=k}|x_j-x_k| ... check
        # against direct numpy evaluation of the fair form.
        ens, tgt = self._ens(jax.random.key(6), b=2, m=5, h=4, w=4, c=1)
        e, t = np.asarray(ens), np.asarray(tgt)
        b, m = e.shape[:2]
        term1 = np.abs(e - t[:, None]).mean(1)
        pair = np.abs(e[:, :, None] - e[:, None, :]).sum((1, 2))
        fair = term1.mean() - (pair / (2 * m * (m - 1))).mean()
        assert float(afcrps_loss(ens, tgt, alpha=1.0)) == pytest.approx(float(fair), rel=1e-5)


# ---------------------------------------------------------------------------
# WMSE + MS-SSIM
# ---------------------------------------------------------------------------

class TestMsSsim:
    def test_identical_images_give_one(self):
        x = jax.random.uniform(jax.random.key(0), (2, 128, 128, 3))
        val = float(ms_ssim(x, x, data_range=1.0, win_size=7))
        assert val == pytest.approx(1.0, abs=1e-5)

    def test_monotone_in_noise(self):
        x = jax.random.uniform(jax.random.key(1), (1, 128, 128, 1))
        vals = []
        for i, sigma in enumerate([0.01, 0.05, 0.2]):
            noise = sigma * jax.random.normal(jax.random.key(10 + i), x.shape)
            vals.append(float(ms_ssim(x, x + noise, data_range=1.0, win_size=7)))
        assert vals[0] > vals[1] > vals[2]

    def test_ssim_against_scipy_oracle(self):
        """Single-scale SSIM vs an independent float64 scipy.ndimage oracle."""
        from scipy import ndimage

        rng = np.random.default_rng(0)
        x = rng.uniform(size=(1, 32, 32, 1)).astype(np.float64)
        y = (x + 0.1 * rng.standard_normal(x.shape)).astype(np.float64)
        win_size, sigma, dr = 7, 1.5, 1.0

        coords = np.arange(win_size) - win_size // 2
        g = np.exp(-(coords**2) / (2 * sigma**2))
        g /= g.sum()
        k2d = np.outer(g, g)

        def filt(im):
            out = ndimage.correlate(im, k2d, mode="constant")
            # crop to valid region
            r = win_size // 2
            return out[r:-r, r:-r]

        xi, yi = x[0, :, :, 0], y[0, :, :, 0]
        c1, c2 = (0.01 * dr) ** 2, (0.03 * dr) ** 2
        mu1, mu2 = filt(xi), filt(yi)
        s1 = filt(xi * xi) - mu1**2
        s2 = filt(yi * yi) - mu2**2
        s12 = filt(xi * yi) - mu1 * mu2
        cs = (2 * s12 + c2) / (s1 + s2 + c2)
        smap = ((2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1)) * cs
        oracle = smap.mean()

        ours = float(ssim(jnp.asarray(x), jnp.asarray(y), data_range=dr, win_size=7))
        assert ours == pytest.approx(oracle, rel=1e-4)

    def test_wmse_weights(self):
        y = jnp.asarray([0.0, 50.0, 200.0])
        w = np.asarray(wmse_weights(y))
        assert w[0] == pytest.approx(0.007)
        assert w[2] == pytest.approx(1.0)  # clipped

    def test_wmse_ms_ssim_components(self):
        x = jax.random.uniform(jax.random.key(2), (2, 128, 128, 3))
        y = x + 0.05 * jax.random.normal(jax.random.key(3), x.shape)
        total, wmse, ms = wmse_ms_ssim_loss(y, x, lam=0.3, return_components=True)
        assert float(total) == pytest.approx(
            0.3 * float(wmse) + 0.7 * float(ms), rel=1e-5
        )
        assert 0.0 < float(ms) < 1.0

    def test_ensemble_collapses_to_mean(self):
        x = jax.random.uniform(jax.random.key(4), (1, 128, 128, 1))
        ens = jnp.stack([x + 0.01, x - 0.01], axis=1)  # (1, 2, H, W, C)
        a = float(wmse_ms_ssim_loss(ens, x, lam=0.5))
        b = float(wmse_ms_ssim_loss(ens.mean(axis=1), x, lam=0.5))
        assert a == pytest.approx(b, rel=1e-6)
