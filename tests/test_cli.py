"""End-to-end CLI smoke test (tiny shapes, synthetic data, forced CPU)."""

import json
import os

import numpy as np
import pytest

from probunet_tpu.cli import main

TINY = [
    "--set",
    'data.resolution=[16,16]', 'data.coords=[0,16,0,16]',
    "data.lowres_scale=4",
    'data.years_train=[1960,1961]', 'data.years_val=[1961,1962]',
    'data.years_test=[1962,1963]',
    'model.num_filters=[8,16]', "model.model_channels=8",
    'model.channel_mult=[1,2]', "model.num_blocks=1", "model.latent_dim=4",
    "train.batch_size=32", "train.num_epochs=1",
    "train.ensemble_size=2", "train.eval_ensemble_size=2",
]


def test_cli_train_evaluate_roundtrip(tmp_path, capsys):
    out = str(tmp_path / "run")
    main(["train", "--preset", "probunet_latent6_64", "--outdir", out] + TINY)
    printed = capsys.readouterr().out
    assert '"final"' in printed
    final = json.loads(
        [ln for ln in printed.splitlines() if '"final"' in ln][-1]
    )["final"]
    assert final["train_crps"] > 0
    assert os.path.exists(os.path.join(out, "losses.pkl"))
    assert os.path.isdir(os.path.join(out, "ckpt"))

    main(["evaluate", "--preset", "probunet_latent6_64", "--outdir", out,
          "--ckpt", os.path.join(out, "ckpt"),
          "--members", "2", "--batch-size", "16", "--max-items", "16"] + TINY)
    printed = capsys.readouterr().out
    ev = json.loads(
        [ln for ln in printed.splitlines() if '"crps_mean"' in ln][-1]
    )
    assert ev["members"] == 2 and len(ev["crps_mean"]) == 1  # 1 variable


def test_cli_unknown_override_message():
    with pytest.raises(KeyError, match="Unknown config key"):
        main(["train", "--set", "nope.x=1"])


def test_cli_extremes(tmp_path, capsys):
    """End-to-end observed-vs-model return levels on synthetic data
    (test_return_levels.ipynb cells 2-15 shape). days_per_year=30 turns one
    synthetic year into 12 'years' of block maxima so the GEV fit has
    enough points at smoke-test cost."""
    out = str(tmp_path / "ext")
    main(["extremes", "--preset", "probunet_latent6_64", "--outdir", out,
          "--pixels", "3,4", "8,8", "--members", "3", "--batch-size", "64",
          "--days", "360", "--days-per-year", "30", "--n-boot", "25",
          "--return-periods", "2", "5", "10"] + TINY)
    printed = capsys.readouterr().out
    res = json.loads(
        [ln for ln in printed.splitlines() if '"pixels"' in ln][-1]
    )
    assert set(res["pixels"]) == {"pixel_3_4", "pixel_8_8"}
    p = res["pixels"]["pixel_3_4"]
    assert len(p["observed"]["gev_fit"]) == 3           # (shape, loc, scale)
    assert len(p["model"]["return_levels"]) == 3
    assert p["model"]["bootstrap_valid"] > 0
    assert p["model"]["empirical_plateau"] > 0
    # raw block maxima are serialized for host-side refit diagnosis
    # (round-5 int8 ledger): observed (n_years,), model (n_years, M);
    # n_years comes from the actual day count (the tiny preset's test
    # split is shorter than the requested --days 360)
    n_years = res["days"] // 30
    assert n_years >= 2
    assert np.asarray(p["observed"]["block_maxima"]).shape == (n_years,)
    assert np.asarray(p["model"]["block_maxima"]).shape == (n_years, 3)
    assert os.path.exists(os.path.join(out, "extremes.json"))


def test_cli_explore_emits_hr_grids(tmp_path, capsys):
    """`explore` emits residual-space AND HR-space grids (the reference
    decodes every grid twice — src/latent_exploration.py:909-921), plus the
    single-sweep HR/per-panel/delta panels
    (src/latent_explore_single_prior.py:183-243)."""
    out = str(tmp_path / "exp")
    main(["explore", "--preset", "probunet_latent6_64", "--outdir", out,
          "--max-items", "24", "--probe-contexts", "4"] + TINY)
    capsys.readouterr()
    for f in ("summary.txt", "pca_artifacts.pkl",
              "grid_decile.png", "grid_decile_hr.png",
              "grid_sigma.png", "grid_sigma_hr.png"):
        assert os.path.exists(os.path.join(out, f)), f

    out2 = str(tmp_path / "exp_single")
    main(["explore", "--preset", "probunet_latent6_64", "--outdir", out2,
          "--single"] + TINY)
    capsys.readouterr()
    for f in ("prior_sweep.png", "prior_sweep_hr.png",
              "prior_sweep_hr_perpanel.png", "prior_sweep_delta.png"):
        assert os.path.exists(os.path.join(out2, f)), f


def test_cli_pack_feeds_train(tmp_path, capsys):
    """pack -> packed .npz -> train consumes it via data.packed_train."""
    pk = str(tmp_path / "train.npz")
    main(["pack", "--preset", "probunet_latent6_64", "--split", "train",
          "--out", pk] + TINY)
    printed = capsys.readouterr().out
    assert json.loads([ln for ln in printed.splitlines()
                       if '"packed"' in ln][-1])["shape"][0] == 365
    out = str(tmp_path / "run")
    main(["train", "--preset", "probunet_latent6_64", "--outdir", out]
         + TINY + [f"data.packed_train={pk}"])
    printed = capsys.readouterr().out
    assert '"final"' in printed


def test_cli_infer_domain_dp(tmp_path, capsys):
    """Full-domain tiled inference with the tile batch sharded over the
    8-device virtual mesh (BASELINE config 5's DP story)."""
    out = str(tmp_path / "dom")
    main(["infer-domain", "--preset", "probunet_latent6_64", "--outdir", out,
          "--domain", "32", "--days", "2", "--members", "2", "--overlap", "4",
          "--batch-tiles", "8", "--dp", "-1"] + TINY)
    printed = capsys.readouterr().out
    assert "data-parallel over" in printed
    res = json.loads(
        [ln for ln in printed.splitlines() if '"tiles_per_day"' in ln][-1]
    )
    assert res["days"] == 2 and res["members"] == 2
    assert all(np.isfinite(v) for v in res["crps_mean"])
    assert os.path.exists(os.path.join(out, "infer_domain.json"))


def test_cli_sweep(tmp_path, capsys):
    out = str(tmp_path / "sweep")
    main(["sweep", "--preset", "probunet_latent6_64", "--outdir", out,
          "--grid", "train.lr=0.001,0.0001", "--epochs", "1"] + TINY)
    printed = capsys.readouterr().out
    res = json.loads(
        [ln for ln in printed.splitlines() if '"best"' in ln][-1]
    )
    assert res["points"] == 2
    assert "train.lr" in res["best"]["overrides"]
    with open(os.path.join(out, "sweep.json")) as f:
        assert len(json.load(f)) == 2


def test_cli_sweep_wandb_yaml(tmp_path, capsys):
    """A reference-style sweeps.yaml (wandb grid schema,
    reference sweeps.yaml:1-14) drives the sweep directly."""
    spec = tmp_path / "sweeps.yaml"
    spec.write_text(
        "program: main.py\n"
        "method: grid\n"
        "metric:\n  name: val-loss\n  goal: minimize\n"
        "parameters:\n  batch_size:\n    values: [16, 32]\n"
    )
    out = str(tmp_path / "sweep")
    main(["sweep", "--preset", "probunet_latent6_64", "--outdir", out,
          "--spec", str(spec), "--epochs", "1"] + TINY)
    printed = capsys.readouterr().out
    res = json.loads(
        [ln for ln in printed.splitlines() if '"best"' in ln][-1]
    )
    assert res["points"] == 2
    assert "train.batch_size" in res["best"]["overrides"]


def test_cli_evaluate_quant_int8(tmp_path, capsys):
    """evaluate --quant int8: calibrates per-conv scales on the first serve
    batches, then serves the full streaming eval with int8 convs — same
    metrics schema, finite values (ops/quantize.py)."""
    main(["evaluate", "--preset", "probunet_latent6_64",
          "--outdir", str(tmp_path / "evq"),
          "--members", "2", "--batch-size", "16", "--max-items", "16",
          "--quant", "int8", "--calib-batches", "1"] + TINY)
    printed = capsys.readouterr().out
    assert "int8 serve: calibrated" in printed
    ev = json.loads(
        [ln for ln in printed.splitlines() if '"crps_mean"' in ln][-1]
    )
    assert ev["members"] == 2
    assert np.isfinite(ev["crps_mean"]).all()
    assert np.isfinite(ev["mae_mean"]).all()


def test_cli_evaluate_quant_skip_heads(tmp_path, capsys):
    """--quant int8 --quant-skip heads: mixed-precision PTQ — the prior's
    conv_mu/conv_log_sigma scales are pruned (quant_skip), those convs
    serve float, everything else int8; metrics stay finite."""
    main(["evaluate", "--preset", "probunet_latent6_64",
          "--outdir", str(tmp_path / "evqs"),
          "--members", "2", "--batch-size", "16", "--max-items", "16",
          "--quant", "int8", "--quant-skip", "heads",
          "--calib-batches", "1"] + TINY)
    printed = capsys.readouterr().out
    assert "pruned 2 of" in printed  # prior conv_mu + conv_log_sigma
    ev = json.loads(
        [ln for ln in printed.splitlines() if '"crps_mean"' in ln][-1]
    )
    assert np.isfinite(ev["crps_mean"]).all()


def test_cli_evaluate_quant_int8_member_mesh(tmp_path, capsys):
    """--quant int8 composed with --member-mesh: the calibrated scales ride
    the ('data','member') mesh step as closed-over constants."""
    main(["evaluate", "--preset", "probunet_latent6_64",
          "--outdir", str(tmp_path / "evqm"),
          "--members", "4", "--batch-size", "16", "--max-items", "16",
          "--member-mesh", "2", "--quant", "int8",
          "--calib-batches", "1"] + TINY)
    printed = capsys.readouterr().out
    assert "int8 serve: calibrated" in printed
    ev = json.loads(
        [ln for ln in printed.splitlines() if '"crps_mean"' in ln][-1]
    )
    assert ev["members"] == 4
    assert np.isfinite(ev["crps_mean"]).all()


def test_cli_evaluate_member_mesh(tmp_path, capsys):
    """evaluate --member-mesh N: ensemble generation sharded over the
    ('data','member') mesh (parallel/member_parallel.py) produces the same
    metrics schema on the 8-device CPU farm."""
    main(["evaluate", "--preset", "probunet_latent6_64",
          "--outdir", str(tmp_path / "ev"),
          "--members", "4", "--batch-size", "16", "--max-items", "16",
          "--member-mesh", "2"] + TINY)
    printed = capsys.readouterr().out
    ev = json.loads(
        [ln for ln in printed.splitlines() if '"crps_mean"' in ln][-1]
    )
    assert ev["members"] == 4 and len(ev["crps_mean"]) == 1
