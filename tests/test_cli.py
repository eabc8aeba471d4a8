"""End-to-end CLI smoke test (tiny shapes, synthetic data, forced CPU)."""

import json
import os

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
