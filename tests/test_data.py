"""Data pipeline tests: ClimEx dataset semantics vs an independent torch
oracle of the reference's per-item logic, stats correctness, loader behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from probunet_tpu.data import ClimexDataset, Batches, prefetch_to_device
from probunet_tpu.data.climex import (
    Standardization,
    compute_stats,
    preprocess_batch,
    residual_to_hr,
)
from probunet_tpu.data.synthetic import synthetic_climex_fields


def _torch_oracle_item(hr_np, k, pipeline, eps=1e-10):
    """Independent torch evaluation of the reference __getitem__ math
    (reference src/climex_utils.py:152-264): per-item AvgPool, nearest
    interpolate (torch default), per-pixel LR stats with unbiased std."""
    import torch

    hr_t = torch.tensor(np.moveaxis(hr_np, -1, 1))  # (T, C, H, W)
    lr_all = torch.nn.AvgPool2d(k)(hr_t)
    mean, std = lr_all.mean(dim=0), lr_all.std(dim=0)
    mean_hr = mean.repeat_interleave(k, dim=1).repeat_interleave(k, dim=2)
    std_hr = std.repeat_interleave(k, dim=1).repeat_interleave(k, dim=2)

    out = []
    for i in range(hr_t.shape[0]):
        hr = hr_t[i]
        lr = torch.nn.AvgPool2d(k)(hr)
        if pipeline == "lrinterp_to_residuals":
            lrinterp = torch.nn.functional.interpolate(
                lr.unsqueeze(0), scale_factor=k
            ).squeeze(0)
            lrinterp_stand = (lrinterp - mean_hr) / (std_hr + eps)
            hr_stand = (hr - mean_hr) / (std_hr + eps)
            out.append((lrinterp_stand.numpy(), (hr_stand - lrinterp_stand).numpy()))
        elif pipeline == "lr_to_hr":
            lr_stand = (lr - mean) / (std + eps)
            hr_stand = (hr - mean_hr) / (std_hr + eps)
            out.append((lr_stand.numpy(), hr_stand.numpy()))
    inputs = np.stack([a for a, _ in out])
    targets = np.stack([b for _, b in out])
    return np.moveaxis(inputs, 1, -1), np.moveaxis(targets, 1, -1)


class TestClimexDataset:
    def _dataset(self, pipeline, k=4, t=20, hw=32, c=3):
        hr = synthetic_climex_fields(t, hw, hw, ("pr", "tasmin", "tasmax")[:c], seed=1)
        return ClimexDataset(
            hr=hr, pipeline=pipeline, lowres_scale=k, transfo=False,
            years=range(2000, 2001),
        )

    @pytest.mark.parametrize("pipeline", ["lrinterp_to_residuals", "lr_to_hr"])
    def test_matches_torch_oracle(self, pipeline):
        ds = self._dataset(pipeline)
        idx = np.arange(len(ds))
        batch = ds.batch(idx)
        exp_inputs, exp_targets = _torch_oracle_item(ds.hr, 4, pipeline)
        np.testing.assert_allclose(
            np.asarray(batch["inputs"]), exp_inputs, rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(batch["targets"]), exp_targets, rtol=2e-4, atol=2e-4
        )

    def test_stats_unbiased_std(self):
        ds = self._dataset("lr_to_hr")
        lr = np.asarray(
            jnp.asarray(ds.hr).reshape(20, 8, 4, 8, 4, 3).mean(axis=(2, 4))
        )
        np.testing.assert_allclose(
            np.asarray(ds.stats.lr_std), lr.std(axis=0, ddof=1), rtol=1e-4
        )

    def test_residual_roundtrip(self):
        """residual_to_hr(targets, lrinterp) must reconstruct HR exactly
        (reference src/climex_utils.py:284-285)."""
        ds = self._dataset("lrinterp_to_residuals")
        batch = ds.batch(np.arange(5))
        rec = ds.residual_to_hr(batch["targets"], batch["lrinterp"])
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(batch["hr"]), rtol=1e-3, atol=1e-3
        )

    def test_all_pipeline_types(self):
        for pipeline in (
            "lr_to_hr", "lr_to_residuals", "lrinterp_to_residuals", "lrinterp_to_hr"
        ):
            ds = self._dataset(pipeline)
            batch = ds.batch(np.arange(3))
            assert batch["inputs"].ndim == 4
            assert batch["targets"].ndim == 4
            if pipeline.startswith("lr_to") and pipeline != "lr_to_hr":
                assert "lrinterp" in batch
            if pipeline == "lr_to_hr":
                assert batch["inputs"].shape == (3, 8, 8, 3)  # LR input
            else:
                k = batch["targets"].shape
                assert k == (3, 32, 32, 3)

    def test_transfo_storage_space(self):
        hr = synthetic_climex_fields(10, 16, 16, ("pr", "tasmin", "tasmax"), seed=2)
        ds = ClimexDataset(hr=hr, pipeline="lr_to_hr", lowres_scale=2, transfo=True)
        # stored pr is softplus_inv(pr); decoded back it must be nonnegative
        from probunet_tpu.data.transforms import invert_physical_transform

        dec = np.asarray(invert_physical_transform(jnp.asarray(ds.hr)))
        assert (dec[..., 0] >= -1e-5).all()
        assert (dec[..., 2] >= dec[..., 1] - 1e-5).all()

    def test_synthetic_construction(self):
        ds = ClimexDataset(
            years=range(2000, 2001), coords=(0, 32, 0, 32), synthetic=True,
            pipeline="lrinterp_to_residuals", lowres_scale=8,
        )
        assert ds.hr.shape == (365, 32, 32, 3)
        assert len(ds.timestamps) == 365


class TestLoader:
    def test_batches_shapes_and_shuffle(self):
        b = Batches(100, 32, shuffle=True, seed=0)
        idxs = list(b)
        assert len(idxs) == 3  # drop_last
        assert all(len(i) == 32 for i in idxs)
        flat = np.concatenate(idxs)
        assert len(np.unique(flat)) == 96
        # different epoch -> different order
        idxs2 = list(b)
        assert not all((a == c).all() for a, c in zip(idxs, idxs2))

    def test_prefetch_preserves_order_and_values(self):
        data = [{"x": np.full((2, 2), i)} for i in range(5)]
        out = list(prefetch_to_device(iter(data), size=2))
        assert len(out) == 5
        for i, item in enumerate(out):
            np.testing.assert_array_equal(np.asarray(item["x"]), i)


def test_packed_roundtrip(tmp_path):
    import numpy as np

    from probunet_tpu.data.climex import (
        ClimexDataset, load_packed, save_packed,
    )

    rng = np.random.default_rng(0)
    hr = rng.standard_normal((6, 16, 16, 3)).astype(np.float32)
    ts = rng.standard_normal(6).astype(np.float32)
    tsf = np.arange(6, dtype=np.float64)
    path = str(tmp_path / "packed.npz")
    save_packed(path, hr, ts, tsf)

    loaded, lts, ltsf = load_packed(path)
    np.testing.assert_allclose(np.asarray(loaded), hr)
    np.testing.assert_allclose(np.asarray(lts), ts)

    ds = ClimexDataset(packed=path, coords=(0, 16, 0, 16), lowres_scale=4)
    assert len(ds) == 6
    np.testing.assert_allclose(ds.hr, hr)
    np.testing.assert_allclose(ds.timestamps, ts)
    # cropping from a larger packed stack
    ds2 = ClimexDataset(packed=path, coords=(0, 8, 4, 12), lowres_scale=4)
    np.testing.assert_allclose(ds2.hr, hr[:, 4:12, 0:8, :])
