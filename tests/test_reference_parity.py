"""Direct golden-parity tests against the reference's OWN torch functions.

Unlike the re-derived oracles elsewhere in the suite, these tests import the
actual reference modules from /root/reference/src and call the reference's
functions on the same random tensors our implementations see — a
transcription error made identically in both places cannot pass here
(VERDICT r2, missing #4).

Reference modules needing unavailable heavy deps (xarray/dask/cartopy/
pytorch_msssim) are imported under minimal import-time stubs; the functions
under test only use torch + numpy + scipy, all present.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

REF = "/root/reference/src"


_INJECTED_STUBS: set = set()


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    _INJECTED_STUBS.add(name)
    return mod


@pytest.fixture(scope="module", autouse=True)
def _cleanup_stubs():
    """Remove injected import stubs so later tests in the same process see
    honest ImportErrors (e.g. utils/plotting's cartopy probe)."""
    yield
    for name in _INJECTED_STUBS:
        sys.modules.pop(name, None)
    _INJECTED_STUBS.clear()


def _import_ref_prob_unet_utils():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # ms_ssim stubbed to a constant for the WMSE-algebra tests; the real
    # 5-level MS-SSIM values are pinned by TestMSSSIMGolden below against an
    # in-test torch implementation of the pytorch_msssim algorithm.
    # Another test file (test_models.py) may have stubbed pytorch_msssim with
    # a None-returning ms_ssim and already imported prob_unet_utils against
    # it — force OUR stub's attribute and re-import so the from-import
    # rebinds (test-order isolation).
    mod = _stub("pytorch_msssim", ms_ssim=None)
    mod.ms_ssim = lambda *a, **k: torch.tensor(0.25)
    sys.modules.pop("prob_unet_utils", None)
    import prob_unet_utils  # type: ignore

    return prob_unet_utils


def _import_ref_climex_utils():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub("dask")
    _stub("dask.distributed", Client=object)
    _stub("xarray")
    _stub("bottleneck")
    _stub("cftime")
    crs = _stub("cartopy.crs", PlateCarree=object, RotatedPole=object)
    _stub("cartopy", crs=crs)
    import climex_utils  # type: ignore

    return climex_utils


def _import_ref_trainmodel():
    _import_ref_climex_utils()  # trainmodel imports climex_utils
    import trainmodel  # type: ignore

    return trainmodel


class TestLossParity:
    """ops/losses.py vs reference src/prob_unet_utils.py:171-305 and
    src/trainmodel.py:66-110, same tensors."""

    def _ens(self, b=2, m=5, c=3, h=8, w=8, seed=0):
        rng = np.random.default_rng(seed)
        ens = rng.standard_normal((b, m, c, h, w)).astype(np.float32)
        tgt = rng.standard_normal((b, c, h, w)).astype(np.float32)
        return ens, tgt

    @pytest.mark.parametrize("m,alpha", [(2, 0.95), (5, 0.95), (15, 0.9)])
    def test_afcrps(self, m, alpha):
        pu = _import_ref_prob_unet_utils()
        ens, tgt = self._ens(m=m, seed=m)
        ref = float(pu.afcrps_loss(torch.tensor(ens), torch.tensor(tgt),
                                   alpha=alpha))
        from probunet_tpu.ops.losses import afcrps_loss

        ours = float(afcrps_loss(jnp.asarray(ens), jnp.asarray(tgt),
                                 alpha=alpha))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    @pytest.mark.parametrize("m", [2, 5, 15])
    def test_crps(self, m):
        pu = _import_ref_prob_unet_utils()
        ens, tgt = self._ens(m=m, seed=10 + m)
        ref = float(pu.crps_loss(torch.tensor(ens), torch.tensor(tgt)))
        from probunet_tpu.ops.losses import crps_loss

        ours = float(crps_loss(jnp.asarray(ens), jnp.asarray(tgt)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_wmse_component_and_combination(self):
        pu = _import_ref_prob_unet_utils()
        rng = np.random.default_rng(3)
        pred = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
        tgt = (rng.standard_normal((2, 3, 16, 16)) * 20).astype(np.float32)
        lam = 0.158
        ref_comb, ref_wmse, ref_ms = pu.wmse_ms_ssim_loss(
            torch.tensor(pred), torch.tensor(tgt), lam=lam,
            return_components=True,
        )
        # reference wmse with the stubbed ms_ssim==0.25:
        assert abs(float(ref_ms) - 0.75) < 1e-6
        from probunet_tpu.ops.losses import wmse_weights

        w = np.asarray(wmse_weights(jnp.asarray(tgt)))
        ours_wmse = float(np.mean(w * (pred - tgt) ** 2))
        np.testing.assert_allclose(ours_wmse, float(ref_wmse), rtol=1e-5)
        np.testing.assert_allclose(
            lam * ours_wmse + (1 - lam) * 0.75, float(ref_comb), rtol=1e-5
        )

    def test_wmse_ensemble_collapses_to_mean(self):
        pu = _import_ref_prob_unet_utils()
        rng = np.random.default_rng(4)
        ens = rng.standard_normal((2, 4, 3, 8, 8)).astype(np.float32)
        tgt = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
        _, ref_wmse, _ = pu.wmse_ms_ssim_loss(
            torch.tensor(ens), torch.tensor(tgt), return_components=True
        )
        from probunet_tpu.ops.losses import wmse_weights

        w = np.asarray(wmse_weights(jnp.asarray(tgt)))
        ours = float(np.mean(w * (ens.mean(axis=1) - tgt) ** 2))
        np.testing.assert_allclose(ours, float(ref_wmse), rtol=1e-5)

    @pytest.mark.parametrize("n", [1, 2, 9])
    def test_crps_empirical(self, n):
        tm = _import_ref_trainmodel()
        rng = np.random.default_rng(n)
        pred = rng.standard_normal((n, 3, 6, 6)).astype(np.float32)
        truth = rng.standard_normal((3, 6, 6)).astype(np.float32)
        ref = tm.crps_empirical(torch.tensor(pred), torch.tensor(truth))
        from probunet_tpu.ops.losses import crps_empirical

        ours = crps_empirical(jnp.asarray(pred), jnp.asarray(truth))
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-6
        )


def _torch_ms_ssim(x, y, data_range, size_average=True, win_size=7,
                   win_sigma=1.5,
                   weights=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333)):
    """In-test torch oracle for ``pytorch_msssim.ms_ssim`` (the library the
    reference calls at src/prob_unet_utils.py:297 is not installed here),
    implementing its documented algorithm with torch.nn.functional only:
    separable Gaussian window (win_sigma=1.5), VALID padding, K=(0.01, 0.03),
    biased covariances, relu'd per-level cs and final ssim, 2x2 avg_pool2d
    with odd-side zero padding between levels, weighted geometric mean.
    NCHW input like the reference call site."""
    import torch.nn.functional as F

    c = x.shape[1]
    coords = torch.arange(win_size, dtype=torch.float64) - win_size // 2
    g = torch.exp(-(coords**2) / (2 * win_sigma**2))
    g = (g / g.sum()).to(x.dtype)
    win_h = g.view(1, 1, win_size, 1).repeat(c, 1, 1, 1)
    win_w = g.view(1, 1, 1, win_size).repeat(c, 1, 1, 1)

    def gfilter(t):
        return F.conv2d(F.conv2d(t, win_h, groups=c), win_w, groups=c)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    levels = len(weights)
    vals = []
    ssim_map = None
    for i in range(levels):
        mu1, mu2 = gfilter(x), gfilter(y)
        s1 = gfilter(x * x) - mu1 * mu1
        s2 = gfilter(y * y) - mu2 * mu2
        s12 = gfilter(x * y) - mu1 * mu2
        cs_map = (2 * s12 + c2) / (s1 + s2 + c2)
        ssim_map = ((2 * mu1 * mu2 + c1) / (mu1 * mu1 + mu2 * mu2 + c1)) * cs_map
        if i < levels - 1:
            vals.append(torch.relu(cs_map.flatten(2).mean(-1)))
            pad = [s % 2 for s in x.shape[2:]]
            x = F.avg_pool2d(x, kernel_size=2, padding=pad)
            y = F.avg_pool2d(y, kernel_size=2, padding=pad)
    vals.append(torch.relu(ssim_map.flatten(2).mean(-1)))
    stacked = torch.stack(vals, dim=0)  # (levels, B, C)
    w = torch.tensor(weights, dtype=x.dtype).view(-1, 1, 1)
    msv = (stacked**w).prod(dim=0)  # (B, C)
    return msv.mean() if size_average else msv.mean(dim=1)


def _smooth_fields(shape, seed, scale=1.0, offset=0.0):
    """Spatially-correlated 'climate-like' f32 fields: white noise smoothed
    by a separable 9-tap moving average (golden tests on white noise would
    exercise only the near-zero-SSIM regime)."""
    rng = np.random.default_rng(seed)
    f = rng.standard_normal(shape).astype(np.float64)
    k = np.ones(9) / 9.0
    for axis in (-2, -1):
        f = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), axis, f)
    return (f * scale + offset).astype(np.float32)


class TestMSSSIMGolden:
    """ops/msssim.py vs the in-test torch oracle of the exact algorithm the
    reference depends on (closes the 0.25-stub hole: the stub above pins only
    the WMSE algebra; these pin the 5-level MS-SSIM values themselves)."""

    def _pair(self, h, w, seed=0, noise=0.15):
        # temperature-like ranges; pred = smooth perturbation of target
        tgt = _smooth_fields((2, 3, h, w), seed, scale=8.0, offset=12.0)
        pred = tgt + _smooth_fields((2, 3, h, w), seed + 1, scale=noise * 8.0)
        return pred, tgt

    @pytest.mark.parametrize("h,w", [(128, 128), (127, 121)])
    @pytest.mark.parametrize("noise", [0.05, 0.5])
    def test_ms_ssim_golden(self, h, w, noise):
        pred, tgt = self._pair(h, w, seed=h + int(noise * 10), noise=noise)
        dr = float(np.ptp(tgt))
        ref = float(_torch_ms_ssim(torch.tensor(pred), torch.tensor(tgt),
                                   data_range=dr, win_size=7))
        from probunet_tpu.ops.msssim import ms_ssim

        ours = float(ms_ssim(jnp.asarray(np.moveaxis(pred, 1, -1)),
                             jnp.asarray(np.moveaxis(tgt, 1, -1)),
                             data_range=dr, win_size=7))
        assert 0.0 < ref <= 1.0
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("win_size", [7, 11])
    def test_ssim_golden(self, win_size):
        # single-scale: weights=(1.0,) reduces the oracle to plain SSIM
        pred, tgt = self._pair(64, 64, seed=win_size)
        dr = float(np.ptp(tgt))
        ref = float(_torch_ms_ssim(torch.tensor(pred), torch.tensor(tgt),
                                   data_range=dr, win_size=win_size,
                                   weights=(1.0,)))
        from probunet_tpu.ops.msssim import ssim

        ours = float(ssim(jnp.asarray(np.moveaxis(pred, 1, -1)),
                          jnp.asarray(np.moveaxis(tgt, 1, -1)),
                          data_range=dr, win_size=win_size))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_wmse_ms_ssim_full_parity(self):
        """End-to-end wmse_ms_ssim_loss vs the reference's own function with
        the real MS-SSIM (oracle bound in place of the import stub) —
        config-#3's loss is now pinned with no stubbed component."""
        pu = _import_ref_prob_unet_utils()
        old = pu.ms_ssim
        pu.ms_ssim = _torch_ms_ssim
        try:
            pred, tgt = self._pair(128, 128, seed=42, noise=0.3)
            lam = 0.158
            ref_comb, ref_wmse, ref_ms = pu.wmse_ms_ssim_loss(
                torch.tensor(pred), torch.tensor(tgt), lam=lam,
                return_components=True,
            )
        finally:
            pu.ms_ssim = old
        from probunet_tpu.ops.losses import wmse_ms_ssim_loss

        ours_comb, ours_wmse, ours_ms = wmse_ms_ssim_loss(
            jnp.asarray(np.moveaxis(pred, 1, -1)),
            jnp.asarray(np.moveaxis(tgt, 1, -1)),
            lam=lam, return_components=True,
        )
        # both return the (1 - MS-SSIM) component
        np.testing.assert_allclose(float(ours_ms), float(ref_ms),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(ours_wmse), float(ref_wmse),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(ours_comb), float(ref_comb),
                                   rtol=1e-5, atol=1e-5)


class TestDatasetParity:
    """data/climex.py vs the reference climex2torch methods themselves
    (reference src/climex_utils.py:152-285), driven on a __new__-constructed
    instance so no NetCDF/xarray machinery is required."""

    def _ref_dataset(self, hr_nchw, k, pipeline, eps=1e-10):
        cu = _import_ref_climex_utils()
        ds = cu.climex2torch.__new__(cu.climex2torch)
        ds.hr = torch.tensor(hr_nchw)
        ds.lowres_scale = k
        ds.type = pipeline
        ds.epsilon = eps
        ds.lrstats = None
        t = hr_nchw.shape[0]
        ds.timestamps = np.arange(t)
        ds.timestamps_float = np.arange(t, dtype=np.float64)
        return ds

    def _fields(self, t=12, c=3, hw=16, seed=5):
        rng = np.random.default_rng(seed)
        return rng.standard_normal((t, c, hw, hw)).astype(np.float32)

    def test_compute_stats(self):
        hr = self._fields()
        k = 4
        ds = self._ref_dataset(hr, k, "lrinterp_to_residuals")
        (lr_m, lr_s), (hr_m, hr_s) = ds.compute_stats()

        from probunet_tpu.data.climex import compute_stats

        stats = compute_stats(jnp.asarray(np.moveaxis(hr, 1, -1)), k)
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(stats.lr_mean), -1, 0), lr_m.numpy(),
            rtol=2e-5, atol=2e-6,
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(stats.lr_std), -1, 0), lr_s.numpy(),
            rtol=2e-4, atol=2e-6,
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(stats.hr_mean), -1, 0), hr_m.numpy(),
            rtol=2e-5, atol=2e-6,
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(stats.hr_std), -1, 0), hr_s.numpy(),
            rtol=2e-4, atol=2e-6,
        )

    @pytest.mark.parametrize(
        "pipeline",
        ["lr_to_hr", "lr_to_residuals", "lrinterp_to_residuals",
         "lrinterp_to_hr"],
    )
    def test_getitem_all_four_pipelines(self, pipeline):
        hr = self._fields(seed=6)
        k = 4
        ds = self._ref_dataset(hr, k, pipeline)
        ref_items = [ds[i] for i in range(3)]
        ref_inputs = np.stack([it["inputs"].numpy() for it in ref_items])
        ref_targets = np.stack([it["targets"].numpy() for it in ref_items])

        from probunet_tpu.data.climex import compute_stats, preprocess_batch

        hr_nhwc = jnp.asarray(np.moveaxis(hr, 1, -1))
        stats = compute_stats(hr_nhwc, k)
        batch = preprocess_batch(hr_nhwc[:3], stats, pipeline, k)
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(batch["inputs"]), -1, 1), ref_inputs,
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(batch["targets"]), -1, 1), ref_targets,
            rtol=2e-4, atol=2e-4,
        )

    def test_residual_to_hr_inversion(self):
        hr = self._fields(seed=7)
        k = 4
        ds = self._ref_dataset(hr, k, "lrinterp_to_residuals")
        items = [ds[i] for i in range(2)]
        resid = torch.stack([it["targets"] for it in items])
        lrinterp = torch.stack([it["lrinterp"] for it in items])
        ref_hr = ds.residual_to_hr(resid, lrinterp).numpy()

        from probunet_tpu.data.climex import (
            compute_stats, preprocess_batch, residual_to_hr,
        )

        hr_nhwc = jnp.asarray(np.moveaxis(hr, 1, -1))
        stats = compute_stats(hr_nhwc, k)
        batch = preprocess_batch(hr_nhwc[:2], stats, "lrinterp_to_residuals", k)
        ours = residual_to_hr(
            batch["targets"], batch["lrinterp"], stats,
            pipeline="lrinterp_to_residuals",
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(ours), -1, 1), ref_hr, rtol=2e-4, atol=2e-4
        )

    def test_softplus_transforms(self):
        cu = _import_ref_climex_utils()
        x = np.linspace(0.05, 30.0, 101).astype(np.float32)
        ref_inv = cu.softplus_inv(torch.tensor(x)).numpy()

        from probunet_tpu.data.transforms import softplus, softplus_inv

        ours_inv = np.asarray(softplus_inv(jnp.asarray(x)))
        np.testing.assert_allclose(ours_inv, ref_inv, rtol=1e-4, atol=1e-5)
        ref_fwd = cu.softplus(torch.tensor(ref_inv)).numpy()
        ours_fwd = np.asarray(softplus(jnp.asarray(ours_inv)))
        np.testing.assert_allclose(ours_fwd, ref_fwd, rtol=1e-4, atol=1e-5)


class TestGEVParity:
    """evals/gev.py vs reference src/prob_unet_utils.py:46-167."""

    def test_block_maxima_and_empirical_periods(self):
        pu = _import_ref_prob_unet_utils()
        rng = np.random.default_rng(8)
        daily = rng.gamma(2.0, 10.0, size=(5 * 365, 3))
        years = range(2000, 2005)
        ref_bm = pu.compute_annual_block_maxima(daily, years)

        from probunet_tpu.evals.gev import (
            compute_annual_block_maxima, get_empirical_return_periods,
        )

        ours_bm = compute_annual_block_maxima(daily)  # (n_years, n_real)
        np.testing.assert_allclose(np.sort(ours_bm.reshape(-1)),
                                   np.sort(ref_bm))

        ref_sorted, ref_T = pu.get_empirical_return_periods(ref_bm)
        ours_T, ours_sorted = get_empirical_return_periods(ours_bm)
        np.testing.assert_allclose(ours_sorted, ref_sorted)
        np.testing.assert_allclose(ours_T, ref_T)

    def test_return_levels(self):
        pu = _import_ref_prob_unet_utils()
        from probunet_tpu.evals.gev import GEVFit, gev_return_level

        fit = GEVFit(shape=-0.019, loc=59.09, scale=15.11)
        for T in (2, 10, 50, 100):
            ref = pu.gev_return_level(fit.shape, fit.loc, fit.scale, T)
            ours = gev_return_level(fit, [T])[0]
            np.testing.assert_allclose(ours, ref, rtol=1e-10)
