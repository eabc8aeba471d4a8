"""Multi-device tests on the virtual 8-CPU mesh (see conftest.py).

Covers SURVEY.md §2.5 P1 (data parallel), P4 (spatial halo exchange /
full-domain tiling), and the driver's dryrun_multichip path.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import PartitionSpec as P

from probunet_tpu.config import Config
from probunet_tpu.data.climex import compute_stats
from probunet_tpu.models.prob_unet import ProbabilisticUNet
from probunet_tpu.parallel import (
    extract_tiles,
    halo_conv2d,
    make_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    replicated,
    stitch_tiles,
    tiled_ensemble,
)
from probunet_tpu.train.loop import make_train_step
from probunet_tpu.train.state import create_train_state


def tiny_cfg(res=32, scale=4, batch=8, m=3):
    cfg = Config()
    cfg.data.resolution = (res, res)
    cfg.data.lowres_scale = scale
    cfg.model.latent_dim = 4
    cfg.model.num_filters = (8, 16)
    cfg.model.model_channels = 8
    cfg.model.channel_mult = (1, 2)
    cfg.model.num_blocks = 1
    cfg.train.batch_size = batch
    cfg.train.ensemble_size = m
    cfg.train.eval_ensemble_size = m
    return cfg


def tiny_model(cfg):
    res = cfg.data.resolution
    return ProbabilisticUNet(
        input_channels=3, num_classes=3,
        latent_dim=cfg.model.latent_dim,
        num_filters=cfg.model.num_filters,
        model_channels=cfg.model.model_channels,
        channel_mult=cfg.model.channel_mult,
        img_resolution=res, num_blocks=cfg.model.num_blocks,
        dropout=0.0,
    )


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["spatial"] == 1
    mesh = make_mesh(n_spatial=2)
    assert mesh.shape["data"] == 4 and mesh.shape["spatial"] == 2
    with pytest.raises(ValueError):
        make_mesh(n_data=16, n_spatial=1)


def test_halo_conv2d_matches_unsharded():
    mesh = make_mesh(n_data=2, n_spatial=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 16, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 5)) * 0.1, jnp.float32)
    want = lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = halo_conv2d(x, k, mesh, axis_name="spatial")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dp_train_step_matches_single_device():
    cfg = tiny_cfg()
    model = tiny_model(cfg)
    res = cfg.data.resolution[0]
    b = cfg.train.batch_size

    rng = np.random.default_rng(1)
    hr_stack = jnp.asarray(rng.standard_normal((16, res, res, 3)), jnp.float32)
    stats = compute_stats(hr_stack, cfg.data.lowres_scale)
    hr_batch = np.asarray(hr_stack[:b])

    x = jnp.zeros((b, res, res, 3), jnp.float32)
    state0 = create_train_state(model, x, x, seed=0)
    b0, b1 = jnp.float32(1.0), jnp.float32(0.1)

    # single-device reference step (donate off so we can reuse state0)
    step1 = make_train_step(model, cfg, donate=False)
    state_ref, m_ref = step1(state0, jnp.asarray(hr_batch), stats, b0, b1)

    # 8-way data-parallel step
    mesh = make_mesh()
    state_dp = jax.device_put(state0, replicated(mesh))
    stats_dp = jax.device_put(stats, replicated(mesh))
    step8 = make_parallel_train_step(model, cfg, mesh, donate=False)
    state_dp, m_dp = step8(state_dp, hr_batch, stats_dp,
                           jax.device_put(b0, replicated(mesh)),
                           jax.device_put(b1, replicated(mesh)))

    assert np.isfinite(float(m_dp["loss"]))
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)
    # parameter updates agree between 1-device and 8-device execution
    leaves_ref = jax.tree.leaves(state_ref.params)
    leaves_dp = jax.tree.leaves(state_dp.params)
    for a, c in zip(leaves_ref, leaves_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-3, atol=2e-5)


def test_dp_spatial_train_and_eval_step():
    cfg = tiny_cfg()
    model = tiny_model(cfg)
    res = cfg.data.resolution[0]
    b = cfg.train.batch_size

    rng = np.random.default_rng(2)
    hr_stack = jnp.asarray(rng.standard_normal((16, res, res, 3)), jnp.float32)
    stats = compute_stats(hr_stack, cfg.data.lowres_scale)
    hr_batch = np.asarray(hr_stack[:b])

    mesh = make_mesh(n_data=4, n_spatial=2)
    x = jnp.zeros((b, res, res, 3), jnp.float32)
    state = jax.device_put(create_train_state(model, x, x, seed=0),
                           replicated(mesh))
    stats_m = jax.device_put(stats, replicated(mesh))
    step = make_parallel_train_step(model, cfg, mesh)
    state, metrics = step(
        state, hr_batch, stats_m,
        jax.device_put(jnp.float32(1.0), replicated(mesh)),
        jax.device_put(jnp.float32(0.1), replicated(mesh)),
    )
    assert np.isfinite(float(metrics["loss"]))

    eval_step = make_parallel_eval_step(model, cfg, mesh)
    em = eval_step(state.params, jax.device_put(jax.random.key(0),
                                                replicated(mesh)),
                   hr_batch, stats_m)
    assert np.isfinite(float(em["recon"]))


def test_tile_starts_alignment():
    from probunet_tpu.parallel.spatial import _tile_starts

    # 288 = ClimEx 280 edge-padded to the pooling multiple (the dataset's
    # pad_to_multiple flag); aligned coverage must be exact there
    starts = _tile_starts(288, 128, 16, align=16)
    assert all(s % 16 == 0 for s in starts)
    covered = set()
    for s in starts:
        covered.update(range(s, s + 128))
    assert covered == set(range(288))

    # raw 280 is NOT coverable by 16-aligned 128-tiles: explicit error
    with pytest.raises(ValueError, match="aligned"):
        _tile_starts(280, 128, 16, align=16)


def test_extract_stitch_roundtrip():
    rng = np.random.default_rng(3)
    field = jnp.asarray(rng.standard_normal((2, 70, 50, 3)), jnp.float32)
    tiles, positions = extract_tiles(field, tile=32, overlap=8)
    assert tiles.shape[1:] == (32, 32, 3)
    rec = stitch_tiles(tiles, positions, (70, 50))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(field),
                               rtol=1e-5, atol=1e-5)


def test_tiled_ensemble_linear_model():
    # sample_fn doubling the tile must produce 2x the full field, any domain size
    rng = np.random.default_rng(4)
    field = np.asarray(rng.standard_normal((2, 80, 80, 2)), np.float32)
    mesh = make_mesh()

    def sample_fn(tiles, key):
        return 2.0 * tiles[:, None]  # (B, M=1, h, w, C)

    out = tiled_ensemble(sample_fn, field, jax.random.key(0),
                         tile=32, overlap=8, mesh=mesh)
    assert out.shape == (2, 1, 80, 80, 2)
    np.testing.assert_allclose(np.asarray(out[:, 0]), 2.0 * field,
                               rtol=1e-4, atol=1e-4)


def test_trainer_with_mesh_matches_single_device():
    from probunet_tpu.data.climex import ClimexDataset
    from probunet_tpu.train.loop import Trainer

    cfg = tiny_cfg(batch=16, m=2)
    cfg.train.num_epochs = 1
    cfg.loss.warmup_epochs = 0
    model = tiny_model(cfg)
    res = cfg.data.resolution[0]
    ds = ClimexDataset(years=range(1960, 1961), coords=(0, res, 0, res),
                       pipeline="lrinterp_to_residuals", lowres_scale=4,
                       synthetic=True)
    ds.hr = ds.hr[:64]
    ds.timestamps = ds.timestamps[:64]
    ds.timestamps_float = ds.timestamps_float[:64]

    t_single = Trainer(cfg, model, ds, ds)
    h_single = t_single.fit(1)

    mesh = make_mesh()
    t_dp = Trainer(cfg, model, ds, ds, mesh=mesh)
    h_dp = t_dp.fit(1)

    np.testing.assert_allclose(h_dp["train_crps"], h_single["train_crps"],
                               rtol=1e-4)
    np.testing.assert_allclose(h_dp["val_crps"], h_single["val_crps"],
                               rtol=1e-4)


def test_partitioned_crps_kernel_matches_oracle(monkeypatch):
    """The shard_map-wrapped Pallas CRPS terms (ops/pallas/partition.py)
    under a data x spatial mesh: loss and grads equal the XLA pairwise
    oracle — batch sharded over 'data', pixels over 'spatial' with psum'd
    partial sums (round-2 advisor finding: a bare pallas_call would be
    replicated by GSPMD)."""
    from probunet_tpu.ops.losses import afcrps_loss, afcrps_loss_pairwise
    from probunet_tpu.ops.pallas.partition import (
        kernel_mesh_is_active, set_kernel_mesh,
    )

    monkeypatch.setenv("PROBUNET_CRPS_IMPL", "pallas")
    mesh = make_mesh(n_data=4, n_spatial=2)
    set_kernel_mesh(mesh)
    assert kernel_mesh_is_active()

    rng = np.random.default_rng(7)
    ens = jnp.asarray(rng.standard_normal((8, 3, 16, 16, 2)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((8, 16, 16, 2)), jnp.float32)

    v, g = jax.jit(jax.value_and_grad(afcrps_loss, argnums=(0, 1)))(ens, tgt)
    v_ref, g_ref = jax.value_and_grad(afcrps_loss_pairwise, argnums=(0, 1))(
        ens, tgt
    )
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-5)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_dp_train_step_pallas_kernels_match_xla(monkeypatch):
    """Full DP train step with the Pallas loss kernels FORCED on (the
    multi-chip TPU configuration: fused fcomb-CRPS ELBO + sharded terms
    kernel, shard_map-wrapped over the registered mesh) must produce the
    same update as the single-device XLA step."""
    cfg = tiny_cfg()
    model = tiny_model(cfg)
    res = cfg.data.resolution[0]
    b = cfg.train.batch_size

    rng = np.random.default_rng(11)
    hr_stack = jnp.asarray(rng.standard_normal((16, res, res, 3)), jnp.float32)
    stats = compute_stats(hr_stack, cfg.data.lowres_scale)
    hr_batch = np.asarray(hr_stack[:b])

    x = jnp.zeros((b, res, res, 3), jnp.float32)
    state0 = create_train_state(model, x, x, seed=0)
    b0, b1 = jnp.float32(1.0), jnp.float32(0.1)

    # single-device XLA reference (default impls on CPU)
    step1 = make_train_step(model, cfg, donate=False)
    state_ref, m_ref = step1(state0, jnp.asarray(hr_batch), stats, b0, b1)

    # 8-way DP with both Pallas kernels forced (interpret mode on CPU)
    monkeypatch.setenv("PROBUNET_CRPS_IMPL", "pallas")
    monkeypatch.setenv("PROBUNET_FUSED_ELBO", "1")
    mesh = make_mesh()
    state_dp = jax.device_put(state0, replicated(mesh))
    stats_dp = jax.device_put(stats, replicated(mesh))
    step8 = make_parallel_train_step(model, cfg, mesh, donate=False)
    state_dp, m_dp = step8(state_dp, hr_batch, stats_dp,
                           jax.device_put(b0, replicated(mesh)),
                           jax.device_put(b1, replicated(mesh)))

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)
    for a, c in zip(jax.tree.leaves(state_ref.params),
                    jax.tree.leaves(state_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-3, atol=2e-5)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_channel_sharded_conv_matches_unsharded():
    """P2 tensor parallelism (SURVEY.md §2.5): Cmid channel-sharded conv
    pair over a ("data", "model") mesh is bit-comparable to the single-device
    computation, weights are REALLY sharded (each device holds Cmid/n_model
    output channels of w1), and the contraction inserts the all-reduce."""
    from probunet_tpu.parallel import (
        channel_sharded_block, init_channel_sharded_params,
        make_channel_sharded_apply, make_dp_tp_mesh, shard_params,
    )

    mesh = make_dp_tp_mesh(n_model=4)  # 2 data x 4 model on the 8-CPU farm
    assert dict(mesh.shape) == {"data": 2, "model": 4}

    c_in, c_mid, c_out = 3, 32, 5
    params = init_channel_sharded_params(jax.random.key(0), c_in, c_mid, c_out)
    x = jax.random.normal(jax.random.key(1), (8, 16, 16, c_in), jnp.float32)

    ref = channel_sharded_block(params, x)  # unsharded oracle

    p_sh = shard_params(params, mesh)
    w1_shard = p_sh["w1"].addressable_shards[0]
    assert w1_shard.data.shape == (3, 3, c_in, c_mid // 4)

    apply = make_channel_sharded_apply(mesh)
    out = apply(p_sh, x)
    assert out.shape == (8, 16, 16, c_out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_multihost_helpers_single_process():
    """Single-process smoke of the multi-host input path: contiguous slab
    indexing + make_array_from_process_local_data onto the mesh."""
    from probunet_tpu.parallel import global_batch, process_local_indices

    idx = np.arange(16)
    local = process_local_indices(idx)
    # one process here: the local slab IS the global batch
    np.testing.assert_array_equal(local, idx)

    mesh = make_mesh()
    batch = np.arange(16 * 4 * 4 * 2, dtype=np.float32).reshape(16, 4, 4, 2)
    arr = global_batch(batch[local], mesh)
    assert arr.shape == (16, 4, 4, 2)
    assert len(arr.addressable_shards) == 8  # batch sharded over "data"
    np.testing.assert_array_equal(np.asarray(arr), batch)


def test_member_mesh_shapes():
    from probunet_tpu.parallel import make_member_mesh

    mesh = make_member_mesh(n_member=4)
    assert mesh.shape["data"] == 2 and mesh.shape["member"] == 4
    with pytest.raises(ValueError):
        make_member_mesh(n_member=3)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        make_member_mesh(n_data=4, n_member=4)  # needs 16 devices


def test_member_parallel_sample_matches_unsharded():
    """Ensemble-member parallelism (serve path): the ("data", "member")-mesh
    generation step must reproduce the single-device generation exactly —
    members are independent given shared U-Net features, so sharding the
    member axis is pure partitioning, no math change."""
    from probunet_tpu.parallel import make_member_mesh, make_parallel_sample_step

    cfg = tiny_cfg()
    model = tiny_model(cfg)
    res = cfg.data.resolution[0]
    b = cfg.train.batch_size
    m = 8

    rng = np.random.default_rng(7)
    hr_stack = jnp.asarray(rng.standard_normal((16, res, res, 3)), jnp.float32)
    stats = compute_stats(hr_stack, cfg.data.lowres_scale)
    hr_batch = np.asarray(hr_stack[:b])

    x = jnp.zeros((b, res, res, 3), jnp.float32)
    state0 = create_train_state(model, x, x, seed=0)
    key = jax.random.key(3)

    # single-device oracle: same step on a trivial 1x1 mesh
    mesh1 = make_member_mesh(n_data=1, n_member=1,
                             devices=jax.devices()[:1])
    step1 = make_parallel_sample_step(model, cfg, mesh1, num_samples=m)
    want = step1(state0.params, hr_batch, key, stats)
    assert want.shape == (b, m, res, res, 3)

    # 2-way data x 4-way member sharding
    mesh = make_member_mesh(n_member=4)
    step8 = make_parallel_sample_step(model, cfg, mesh, num_samples=m)
    got = step8(state0.params, hr_batch, key, stats)

    assert got.sharding.spec == P("data", "member", None, None, None)
    # member shards live on distinct devices
    assert len(got.addressable_shards) == 8
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_multiprocess_dp_two_processes():
    """REAL multi-process data parallelism: two OS processes, 2 virtual CPU
    devices each, gloo collectives via jax.distributed; each process loads
    only its slab of the global batch (the multihost input path) and the
    distributed update must match the single-device update (asserted inside
    tests/mp_worker.py by process 0)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        # never leak a hung gloo worker onto this 1-core box
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MP_OK pid={pid}" in out, out[-3000:]
    # both processes computed the same replicated loss
    l0 = outs[0].split("loss=")[1].split()[0]
    l1 = outs[1].split("loss=")[1].split()[0]
    assert l0 == l1, (l0, l1)


def test_member_parallel_sample_pertimestep_stats():
    """The member-sharded sample step must thread per-item stand_stats
    (pertimestep standardization) through residual_to_hr identically to the
    1-device mesh — covers the item-stats member-axis broadcast."""
    from probunet_tpu.parallel import make_member_mesh, make_parallel_sample_step

    cfg = tiny_cfg()
    cfg.data.standardization = "pertimestep"
    model = tiny_model(cfg)
    res = cfg.data.resolution[0]
    b = cfg.train.batch_size

    rng = np.random.default_rng(9)
    hr_stack = jnp.asarray(rng.standard_normal((16, res, res, 3)), jnp.float32)
    stats = compute_stats(hr_stack, cfg.data.lowres_scale)
    hr_batch = np.asarray(hr_stack[:b])
    x = jnp.zeros((b, res, res, 3), jnp.float32)
    state0 = create_train_state(model, x, x, seed=0)
    key = jax.random.key(5)

    mesh1 = make_member_mesh(n_data=1, n_member=1, devices=jax.devices()[:1])
    want = make_parallel_sample_step(model, cfg, mesh1, num_samples=4)(
        state0.params, hr_batch, key, stats)
    mesh = make_member_mesh(n_member=2)
    got = make_parallel_sample_step(model, cfg, mesh, num_samples=4)(
        state0.params, hr_batch, key, stats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
