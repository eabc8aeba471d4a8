"""Tests for utils (plotting smoke, profiling counters) + weight analysis +
multihost helpers (single-process degenerate case)."""

import numpy as np

import jax
import jax.numpy as jnp


def test_throughput_counter():
    from probunet_tpu.utils.profiling import Throughput

    tp = Throughput(batch_size=4, warmup_steps=1)
    for _ in range(5):
        tp.step()
    s = tp.summary()
    assert s["steps_per_sec"] > 0
    assert s["samples_per_sec"] == s["steps_per_sec"] * 4


def test_nan_check_mode_restores():
    from probunet_tpu.utils.profiling import nan_check_mode

    before = jax.config.jax_debug_nans
    with nan_check_mode(True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_weight_function_analysis():
    from probunet_tpu.evals import weight_function_analysis

    rng = np.random.default_rng(0)
    targets = rng.standard_normal((4, 8, 8, 3)).astype(np.float32) * 20
    out = weight_function_analysis(targets)
    assert set(out) == {"pr", "tasmin", "tasmax"}
    a = out["pr"]
    assert 0 <= a["saturated_fraction"] <= 1
    assert np.all(a["weight_curve"] <= 1.0 + 1e-6)
    assert np.all(np.diff(a["weight_curve"]) >= -1e-9)  # monotone in y


def test_misc_utils():
    from probunet_tpu.utils import l2_regularization, moving_average

    params = {"a": jnp.ones((2, 3)), "b": {"c": 2.0 * jnp.ones(4)}}
    np.testing.assert_allclose(float(l2_regularization(params)), 6 + 16)

    ma = moving_average(np.arange(10.0), window=4)
    np.testing.assert_allclose(ma, [1.5, 2.5, 3.5, 4.5, 5.5, 6.5, 7.5])
    # shorter than window: passthrough copy
    np.testing.assert_allclose(moving_average([1.0, 2.0], window=4), [1, 2])


def test_multihost_single_process():
    from probunet_tpu.parallel import (
        global_batch, make_mesh, process_local_indices,
    )

    idx = np.arange(16)
    local = process_local_indices(idx)
    np.testing.assert_array_equal(local, idx)  # 1 process owns everything

    mesh = make_mesh()
    batch = np.random.default_rng(1).standard_normal((8, 4, 4, 2)).astype(
        np.float32
    )
    arr = global_batch(batch, mesh)
    assert arr.shape == (8, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(arr), batch)


def test_plotting_smoke(tmp_path):
    from probunet_tpu.utils.plotting import (
        plot_batch, plot_latent_grid, plot_loss_curves, plot_psd,
        plot_residual_differences, plot_residual_sample_batch,
        plot_sample_batch, plot_return_levels,
    )
    from probunet_tpu.evals.gev import return_level_analysis
    from probunet_tpu.evals.weights import (
        plot_weight_function, weight_function_analysis,
    )

    rng = np.random.default_rng(2)
    b, m, h, w, c = 2, 3, 8, 8, 3
    lr = rng.standard_normal((b, 4, 4, c)).astype(np.float32)
    hr = rng.standard_normal((b, h, w, c)).astype(np.float32)
    pred = rng.standard_normal((b, h, w, c)).astype(np.float32)
    samples = rng.standard_normal((b, m, h, w, c)).astype(np.float32)

    plot_batch(lr, pred, hr, save_path=str(tmp_path / "b.png"))
    plot_sample_batch(samples, hr, lrinterp=pred,
                      save_path=str(tmp_path / "s.png"))
    plot_residual_sample_batch(samples, hr, save_path=str(tmp_path / "r.png"))
    plot_residual_differences(samples, save_path=str(tmp_path / "d.png"))
    plot_loss_curves({"train_crps": [1, 0.5], "train_kl": [10, 5],
                      "val_crps": [1.1, 0.6], "val_kl": [9, 4]},
                     save_path=str(tmp_path / "l.png"))
    plot_psd({"gt": np.abs(rng.standard_normal((6, c))) + 1,
              "model": np.abs(rng.standard_normal((6, c))) + 1},
             save_path=str(tmp_path / "p.png"))
    daily = rng.gamma(2.0, 5.0, size=365 * 20)
    ana = return_level_analysis(daily, n_boot=20)
    plot_return_levels(ana, save_path=str(tmp_path / "rl.png"))
    plot_latent_grid(rng.standard_normal((2, 2, h, w, c)),
                     save_path=str(tmp_path / "g.png"))
    plot_weight_function(weight_function_analysis(hr),
                         save_path=str(tmp_path / "w.png"))

    made = list(tmp_path.iterdir())
    assert len(made) >= 9
    assert all(f.stat().st_size > 1000 for f in made)
