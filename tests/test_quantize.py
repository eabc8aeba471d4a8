"""int8 post-training quantization (ops/quantize.py).

Validates the quantized conv against its float oracle, the calibration
sow/merge protocol, and the end-to-end calibrate -> serve flow on a tiny
ProbabilisticUNet. The reference has no quantization (torch fp32 end to
end); this is a framework extension, so the oracle is our own float path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probunet_tpu.models.prob_unet import ProbabilisticUNet
from probunet_tpu.ops.quantize import (
    int8_conv,
    merge_stats,
    quant_scales_from_stats,
    quantize_int8,
    sow_absmax,
    weight_scales,
)


class TestPrimitives:
    def test_quantize_roundtrip_error_bound(self):
        x = jax.random.normal(jax.random.key(0), (64, 64)) * 3.0
        scale = jnp.max(jnp.abs(x)) / 127.0
        q = quantize_int8(x, scale)
        assert q.dtype == jnp.int8
        # symmetric scheme never emits -128
        assert int(q.min()) >= -127
        err = np.abs(np.asarray(q, np.float32) * float(scale) - np.asarray(x))
        assert err.max() <= float(scale) / 2 + 1e-6

    def test_weight_scales_per_channel(self):
        w = jnp.stack(
            [jnp.full((3, 3, 4), 0.5), jnp.full((3, 3, 4), 2.0)], axis=-1
        )
        s = weight_scales(w)
        np.testing.assert_allclose(
            np.asarray(s), [0.5 / 127.0, 2.0 / 127.0], rtol=1e-6
        )

    def test_int8_conv_matches_float_oracle(self):
        kx, kw = jax.random.split(jax.random.key(1))
        x = jax.random.normal(kx, (2, 16, 16, 8))
        w = jax.random.normal(kw, (3, 3, 8, 16)) * 0.1
        in_scale = jnp.max(jnp.abs(x)) / 127.0
        y_q = int8_conv(x, w, in_scale, pad=1)
        y_f = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        rel = float(jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f))
        assert rel < 0.02, rel

    def test_int8_conv_exact_on_grid_values(self):
        # inputs/weights already on the int8 grid, with each output
        # channel's absmax pinned to exactly 127 so the per-channel weight
        # scale is exactly 1.0 -> zero quantization error end to end
        x = jnp.round(
            jax.random.normal(jax.random.key(2), (1, 8, 8, 4)) * 20
        ).clip(-127, 127)
        w = jnp.round(
            jax.random.normal(jax.random.key(3), (3, 3, 4, 4)) * 20
        ).clip(-127, 127)
        w = w.at[0, 0, 0, :].set(127.0)
        y_q = int8_conv(x, w, jnp.float32(1.0), pad=1)
        y_f = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_f), rtol=1e-5)

    def test_merge_stats_elementwise_max(self):
        a = {"m": {"absmax": jnp.float32(1.0)}}
        b = {"m": {"absmax": jnp.float32(3.0)}}
        out = merge_stats(a, b)
        assert float(out["m"]["absmax"]) == 3.0

    def test_scales_from_stats_renames_and_divides(self):
        stats = {"conv": {"absmax": jnp.float32(127.0),
                          "absmax2": jnp.float32(254.0)}}
        scales = quant_scales_from_stats(stats)
        assert float(scales["conv"]["in_scale"]) == 1.0
        assert float(scales["conv"]["in_scale2"]) == 2.0

    def test_quant_skip_prunes_matching_paths(self):
        from probunet_tpu.ops.quantize import quant_skip

        s = jnp.float32(0.5)
        tree = {
            "prior": {"conv_mu": {"in_scale": s},
                      "conv_log_sigma": {"in_scale": s},
                      "enc0_conv0": {"in_scale": s}},
            "unet": {"enc_conv0": {"in_scale": s}},
        }
        out = quant_skip(tree, ["heads"])  # alias -> conv_mu|conv_log_sigma
        # matched modules are gone entirely (no empty dicts left behind)
        assert "conv_mu" not in out["prior"]
        assert "conv_log_sigma" not in out["prior"]
        assert float(out["prior"]["enc0_conv0"]["in_scale"]) == 0.5
        assert float(out["unet"]["enc_conv0"]["in_scale"]) == 0.5
        # path-anchored regex works too, and no-pattern is identity
        assert "prior" not in quant_skip(tree, [r"^prior/"])
        assert quant_skip(tree, None) is tree


def _tiny_model():
    return ProbabilisticUNet(
        input_channels=2, num_classes=2, latent_dim=4,
        num_filters=(8, 16), model_channels=16, channel_mult=(1, 2),
        img_resolution=(32, 32), num_blocks=1,
    )


class TestEndToEnd:
    def test_calibrate_then_serve(self):
        m = _tiny_model()
        x = jax.random.normal(jax.random.key(0), (2, 32, 32, 2))
        variables = m.init(
            {"params": jax.random.key(2), "latent": jax.random.key(3)},
            x, num_samples=2, method=ProbabilisticUNet.sample)
        params = variables["params"]

        out_f, vs = m.apply({"params": params}, x, num_samples=2,
                            method=ProbabilisticUNet.sample,
                            rngs={"latent": jax.random.key(3)},
                            mutable=["quant_stats"])
        qs = merge_stats(vs["quant_stats"], vs["quant_stats"])
        scales = quant_scales_from_stats(qs)
        # every conv in the sample path found a scale
        assert len(jax.tree.leaves(scales)) >= 30

        out_q = m.apply({"params": params, "quant": scales}, x,
                        num_samples=2, method=ProbabilisticUNet.sample,
                        rngs={"latent": jax.random.key(3)})
        assert out_q.shape == out_f.shape
        rel = float(jnp.linalg.norm(out_q - out_f) / jnp.linalg.norm(out_f))
        assert rel < 0.06, rel

    def test_float_path_untouched_without_collections(self):
        # hooks must be dead code when neither collection is supplied:
        # identical bits vs a checkout without the hooks is impractical to
        # assert here, but determinism + no "quant_stats" output is checkable
        m = _tiny_model()
        x = jax.random.normal(jax.random.key(0), (1, 32, 32, 2))
        variables = m.init(
            {"params": jax.random.key(2), "latent": jax.random.key(3)},
            x, num_samples=1, method=ProbabilisticUNet.sample)
        assert set(variables) == {"params"}  # no stray collections from init
        a = m.apply(variables, x, num_samples=1,
                    method=ProbabilisticUNet.sample,
                    rngs={"latent": jax.random.key(4)})
        b = m.apply(variables, x, num_samples=1,
                    method=ProbabilisticUNet.sample,
                    rngs={"latent": jax.random.key(4)})
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_calibrate_sample_helper(self):
        # the CLI-facing helper: multi-batch calibration over preprocessed
        # inputs -> a scales tree every conv in the sample path can find
        from probunet_tpu.ops.quantize import calibrate_sample

        m = _tiny_model()
        xs = [jax.random.normal(jax.random.key(i), (2, 32, 32, 2))
              for i in range(3)]
        variables = m.init(
            {"params": jax.random.key(2), "latent": jax.random.key(3)},
            xs[0], num_samples=2, method=ProbabilisticUNet.sample)
        scales = calibrate_sample(m, variables["params"], xs, num_samples=2)
        leaves = jax.tree.leaves(scales)
        assert len(leaves) >= 30
        assert all(float(s) > 0 for s in leaves)
        out = m.apply({"params": variables["params"], "quant": scales},
                      xs[0], num_samples=2,
                      method=ProbabilisticUNet.sample,
                      rngs={"latent": jax.random.key(4)})
        assert bool(jnp.isfinite(out).all())

    def test_member_parallel_quant_matches_single_device(self):
        # quantized generation over the ("data","member") mesh must equal
        # the single-device quantized sample path (same scales, same key)
        from probunet_tpu.config import preset
        from probunet_tpu.data.climex import compute_stats
        from probunet_tpu.data.synthetic import synthetic_climex_fields
        from probunet_tpu.ops.quantize import calibrate_sample
        from probunet_tpu.parallel.member_parallel import (
            make_member_mesh, make_parallel_sample_step,
        )

        cfg = preset("probunet_latent6_64")
        cfg.data.resolution = (16, 16)
        cfg.data.lowres_scale = 4
        cfg.model.num_filters = (8, 16)
        cfg.model.model_channels = 8
        cfg.model.channel_mult = (1, 2)
        cfg.model.num_blocks = 1
        cfg.model.latent_dim = 4

        from probunet_tpu.cli import make_model
        from probunet_tpu.data.climex import preprocess_batch

        model = make_model(cfg)
        hr = jnp.asarray(synthetic_climex_fields(
            4, 16, 16, cfg.data.variables, seed=0))
        stats = compute_stats(hr, cfg.data.lowres_scale)
        x = jnp.zeros((1, 16, 16, cfg.model.input_channels))
        params = model.init(
            {"params": jax.random.key(0), "latent": jax.random.key(1)}, x, x
        )["params"]

        d = cfg.data
        batch = preprocess_batch(hr, stats, d.pipeline, d.lowres_scale,
                                 d.interp_mode, d.epsilon, d.standardization)
        scales = calibrate_sample(model, params, [batch["inputs"]],
                                  num_samples=2)

        mesh = make_member_mesh(n_member=2)
        gen_q = make_parallel_sample_step(model, cfg, mesh, num_samples=2,
                                          quant=scales)
        key = jax.random.key(7)
        out_mesh = gen_q(params, hr, key, stats)

        gen_1 = make_parallel_sample_step(
            model, cfg, make_member_mesh(n_member=1, devices=jax.devices()[:1]),
            num_samples=2, quant=scales)
        out_single = gen_1(params, hr, key, stats)
        np.testing.assert_allclose(np.asarray(out_mesh),
                                   np.asarray(out_single), rtol=2e-4,
                                   atol=2e-4)

    def test_calibrate_elbo_then_eval_serve(self):
        # VERDICT r4 #2: the no-grad posterior-ELBO eval path served int8.
        # calibrate_elbo runs the EXACT eval loss wiring with the
        # quant_stats collection mutable (UNet + prior + posterior convs —
        # a superset of the sample path), and make_eval_step(quant=...)
        # must produce a finite loss close to the float eval on the same
        # rng (identical latent draws; int8 perturbs values only).
        from probunet_tpu.cli import make_model
        from probunet_tpu.config import preset
        from probunet_tpu.data.climex import compute_stats
        from probunet_tpu.data.synthetic import synthetic_climex_fields
        from probunet_tpu.ops.quantize import calibrate_elbo, calibrate_sample
        from probunet_tpu.train.loop import make_eval_step

        cfg = preset("probunet_latent6_64")
        cfg.data.resolution = (16, 16)
        cfg.data.lowres_scale = 4
        cfg.model.num_filters = (8, 16)
        cfg.model.model_channels = 8
        cfg.model.channel_mult = (1, 2)
        cfg.model.num_blocks = 1
        cfg.model.latent_dim = 4
        cfg.train.eval_ensemble_size = 2

        model = make_model(cfg)
        hr = jnp.asarray(synthetic_climex_fields(
            8, 16, 16, cfg.data.variables, seed=0))
        stats = compute_stats(hr, cfg.data.lowres_scale)
        x = jnp.zeros((1, 16, 16, cfg.model.input_channels))
        params = model.init(
            {"params": jax.random.key(0), "latent": jax.random.key(1)}, x, x
        )["params"]

        scales = calibrate_elbo(model, params, [hr[:4], hr[4:]], cfg, stats)
        # superset of the prior-sample path: the posterior encoder's convs
        # calibrate too
        from probunet_tpu.data.climex import preprocess_batch
        d = cfg.data
        batch = preprocess_batch(hr[:4], stats, d.pipeline, d.lowres_scale,
                                 d.interp_mode, d.epsilon, d.standardization)
        sample_scales = calibrate_sample(model, params, [batch["inputs"]],
                                         num_samples=2)
        assert (len(jax.tree.leaves(scales))
                > len(jax.tree.leaves(sample_scales)))

        step_f = make_eval_step(model, cfg)
        step_q = make_eval_step(model, cfg, quant=scales)
        rng = jax.random.key(5)
        mf = step_f(params, rng, hr[:4], stats)
        mq = step_q(params, rng, hr[:4], stats)
        assert np.isfinite(float(mq["loss"]))
        rel = abs(float(mq["loss"]) - float(mf["loss"])) / max(
            1e-6, abs(float(mf["loss"])))
        assert rel < 0.15, rel

    def test_quant_skip_heads_serves_float_latent_heads(self):
        # mixed-precision PTQ (QUALITY.md int8 ledger, pixel (96,20)):
        # pruning the prior's conv_mu/conv_log_sigma scales must leave
        # those convs on their float path — with the same latent rng the
        # sampled z then comes from the EXACT float distribution, so the
        # skip-heads output can only differ from float through the
        # (quantized) UNet features, never through the latent draw.
        from probunet_tpu.ops.quantize import calibrate_sample, quant_skip

        m = _tiny_model()
        x = jax.random.normal(jax.random.key(0), (2, 32, 32, 2))
        variables = m.init(
            {"params": jax.random.key(2), "latent": jax.random.key(3)},
            x, num_samples=2, method=ProbabilisticUNet.sample)
        params = variables["params"]
        scales = calibrate_sample(m, params, [x], num_samples=2)
        mixed = quant_skip(scales, ["heads"])
        n_full, n_mixed = (len(jax.tree.leaves(t)) for t in (scales, mixed))
        assert n_full - n_mixed == 2  # prior conv_mu + conv_log_sigma

        out_f = m.apply({"params": params}, x, num_samples=2,
                        method=ProbabilisticUNet.sample,
                        rngs={"latent": jax.random.key(5)})
        out_m = m.apply({"params": params, "quant": mixed}, x,
                        num_samples=2, method=ProbabilisticUNet.sample,
                        rngs={"latent": jax.random.key(5)})
        assert out_m.shape == out_f.shape
        rel = float(jnp.linalg.norm(out_m - out_f) / jnp.linalg.norm(out_f))
        assert rel < 0.06, rel

    def test_grad_path_unaffected(self):
        # training never supplies "quant": grads must flow exactly as before
        m = _tiny_model()
        x = jax.random.normal(jax.random.key(0), (1, 32, 32, 2))
        variables = m.init(
            {"params": jax.random.key(2), "latent": jax.random.key(3)},
            x, num_samples=1, method=ProbabilisticUNet.sample)

        def loss(p):
            out = m.apply({"params": p}, x, num_samples=1,
                          method=ProbabilisticUNet.sample,
                          rngs={"latent": jax.random.key(4)})
            return jnp.mean(out ** 2)

        g = jax.grad(loss)(variables["params"])
        norms = [float(jnp.linalg.norm(v)) for v in jax.tree.leaves(g)]
        assert np.isfinite(norms).all()
        assert max(norms) > 0.0
