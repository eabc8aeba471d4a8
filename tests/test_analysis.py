"""Tests for latent exploration / collapse diagnostics."""

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.analysis import (
    LatentPCA,
    collapse_diagnostics,
    collect_latents,
    decode_latent_grid,
    format_summary,
    pc_grid_deciles,
    pc_grid_sigma,
    single_prior_sweep,
)
from probunet_tpu.analysis.latent import grid_to_z
from probunet_tpu.data.climex import ClimexDataset
from probunet_tpu.models.prob_unet import ProbabilisticUNet


def make_model_and_dataset(latent_dim=6, res=32):
    ds = ClimexDataset(
        years=range(1960, 1961),
        variables=("pr", "tasmin", "tasmax"),
        coords=(0, res, 0, res),
        pipeline="lrinterp_to_residuals",
        lowres_scale=4,
        synthetic=True,
    )
    ds.hr = ds.hr[:48]  # keep probes fast
    ds.timestamps = ds.timestamps[:48]
    ds.timestamps_float = ds.timestamps_float[:48]
    model = ProbabilisticUNet(
        input_channels=3, num_classes=3, latent_dim=latent_dim,
        num_filters=(8, 16), model_channels=8, channel_mult=(1, 2),
        img_resolution=(res, res), num_blocks=1, dropout=0.0,
    )
    x = jnp.zeros((2, res, res, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1)}, x, x
    )
    return model, variables["params"], ds


def test_pca_roundtrip():
    rng = np.random.default_rng(0)
    z = rng.standard_normal((200, 8)) * np.arange(1, 9)
    pca = LatentPCA.fit(z)
    scores = pca.transform(z)
    back = pca.inverse_transform(scores)
    np.testing.assert_allclose(back, z, rtol=1e-8, atol=1e-8)
    # explained variance sorted descending
    assert np.all(np.diff(pca.explained_variance_ratio) <= 1e-12)


def test_pca_small_dim_identity():
    rng = np.random.default_rng(1)
    z = rng.standard_normal((50, 2))
    pca = LatentPCA.fit(z)
    np.testing.assert_allclose(pca.components, np.eye(2))


def test_pc_grids():
    rng = np.random.default_rng(2)
    scores = rng.standard_normal((500, 4))
    gd = pc_grid_deciles(scores, n=10)
    gs = pc_grid_sigma(scores, n=7, k=3.0)
    assert gd.shape == (10, 10, 2) and gs.shape == (7, 7, 2)
    # decile grid is monotone along each axis
    assert np.all(np.diff(gd[:, 0, 0]) >= 0)
    pca = LatentPCA.fit(rng.standard_normal((100, 4)))
    zs = grid_to_z(pca, gs)
    assert zs.shape == (49, 4)


def test_collect_and_decode():
    model, params, ds = make_model_and_dataset()
    lat = collect_latents(model, params, ds, batch_size=16, max_items=32)
    assert lat["mu"].shape == (32, 6)
    assert np.all(lat["sigma"] > 0)

    post = collect_latents(model, params, ds, batch_size=16,
                           use_posterior=True, max_items=32)
    assert post["mu"].shape == (32, 6)

    batch = ds.preprocess(jnp.asarray(ds.get_hr_batch(np.array([0]))))
    feats, _, _ = model.apply(
        {"params": params}, batch["inputs"],
        method=ProbabilisticUNet.encode,
    )
    zs = np.asarray(lat["mu"][:5])
    dec = decode_latent_grid(model, params, feats, zs)
    assert dec.shape == (5, 32, 32, 3)
    assert np.all(np.isfinite(dec))


def test_collapse_diagnostics_and_summary():
    model, params, ds = make_model_and_dataset()
    diag = collapse_diagnostics(model, params, ds, batch_size=16,
                                num_samples=4, max_items=32, n_contexts=8)
    assert diag["latent_dim"] == 6
    assert diag["n_contexts"] == 8
    assert diag["prior_sigma_spectrum"].shape == (6,)
    assert diag["z_sensitivity"].shape == (6,)
    assert np.isfinite(diag["sample_variance_ratio"])
    assert diag["sample_variance_ratio_per_context"].shape == (8,)
    assert np.all(np.isfinite(diag["sample_variance_ratio_per_context"]))
    assert np.isfinite(diag["grad_ratio_z_over_feat"])
    report = format_summary(diag)
    assert "VERDICT" in report and "latent_dim" in report
    assert "probe contexts" in report


def test_collapse_diagnostics_single_context_fast_path():
    """n_contexts=1 keeps the original single-context behavior working."""
    model, params, ds = make_model_and_dataset()
    diag = collapse_diagnostics(model, params, ds, batch_size=16,
                                num_samples=4, max_items=16, n_contexts=1)
    assert diag["n_contexts"] == 1
    assert diag["sample_variance_ratio_per_context"].shape == (1,)
    assert np.isfinite(diag["sample_variance_ratio"])


def test_single_prior_sweep():
    model, params, ds = make_model_and_dataset()
    out = single_prior_sweep(model, params, ds, item=0, n=3, span=6.0)
    assert out["decoded"].shape == (3, 3, 32, 32, 3)
    assert out["center"].shape == (32, 32, 3)
    assert len(out["dims"]) == 2
    # the two swept dims are the two largest-sigma dims
    top2 = set(np.argsort(out["sigma"])[::-1][:2].tolist())
    assert set(np.asarray(out["dims"]).tolist()) == top2
