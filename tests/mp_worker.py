"""Two-process data-parallel worker (driven by tests/test_parallel.py).

Each process owns 2 virtual CPU devices (4 global), rendezvouses through
``jax.distributed`` (gloo CPU collectives), loads ONLY its contiguous slab
of the global batch (``process_local_indices``), assembles the globally
sharded input with ``global_batch`` (zero cross-host data movement), and
runs one mesh-sharded ELBO train step. Process 0 also runs the
single-device reference step and asserts the distributed update matches —
the real multi-process analog of the in-process DP equivalence test.

Usage: python tests/mp_worker.py <process_id> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

pid, port = int(sys.argv[1]), sys.argv[2]

from probunet_tpu.parallel import initialize  # noqa: E402

initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from probunet_tpu.config import Config  # noqa: E402
from probunet_tpu.data.climex import compute_stats  # noqa: E402
from probunet_tpu.models.prob_unet import ProbabilisticUNet  # noqa: E402
from probunet_tpu.parallel import (  # noqa: E402
    global_batch,
    make_mesh,
    make_parallel_train_step,
    process_local_indices,
    replicate_global,
)
from probunet_tpu.train.loop import make_train_step  # noqa: E402
from probunet_tpu.train.state import create_train_state  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

res, scale, b, m = 32, 4, 8, 3
cfg = Config()
cfg.data.resolution = (res, res)
cfg.data.lowres_scale = scale
cfg.model.latent_dim = 4
cfg.model.num_filters = (8, 16)
cfg.model.model_channels = 8
cfg.model.channel_mult = (1, 2)
cfg.model.num_blocks = 1
cfg.train.batch_size = b
cfg.train.ensemble_size = m

model = ProbabilisticUNet(
    input_channels=3, num_classes=3, latent_dim=cfg.model.latent_dim,
    num_filters=cfg.model.num_filters,
    model_channels=cfg.model.model_channels,
    channel_mult=cfg.model.channel_mult, img_resolution=(res, res),
    num_blocks=cfg.model.num_blocks, dropout=0.0,
)

# identical on every process: same seed, deterministic init
rng = np.random.default_rng(1)
hr_stack = jnp.asarray(rng.standard_normal((16, res, res, 3)), jnp.float32)
stats = compute_stats(hr_stack, scale)
x = jnp.zeros((b, res, res, 3), jnp.float32)
state = create_train_state(model, x, x, seed=0)

mesh = make_mesh(n_data=4, n_spatial=1)  # all 4 global devices
# identical on every process (same seeds, deterministic init) -> promote to
# globally-replicated arrays (handles the typed PRNG key in TrainState)
state_g = replicate_global(state, mesh)
stats_g = replicate_global(stats, mesh)

# this process loads ONLY its slab of the global batch
local_idx = process_local_indices(np.arange(b))
assert len(local_idx) == b // 2
local_rows = np.asarray(hr_stack[local_idx])
hr_global = global_batch(local_rows, mesh, spatial=False)

step = make_parallel_train_step(model, cfg, mesh, donate=False, spatial=False)
new_state, metrics = step(
    state_g, hr_global, stats_g, np.float32(1.0), np.float32(0.1)
)
loss = float(metrics["loss"])
assert np.isfinite(loss)

loss1 = None
if pid == 0:
    # single-device reference on the same (full) batch
    step1 = make_train_step(model, cfg, donate=False)
    state1 = create_train_state(model, x, x, seed=0)
    state1, m1 = step1(state1, jnp.asarray(hr_stack[:b]), stats,
                       jnp.float32(1.0), jnp.float32(0.1))
    loss1 = float(m1["loss"])
    assert abs(loss - loss1) <= 1e-4 * max(1.0, abs(loss1)), (loss, loss1)
    for a, c in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-3, atol=2e-5)

# ---- full distributed epoch through the real input pipeline ----
# Batches (seed-synchronized shuffle) -> prefetch_to_device, which
# assembles each process's slab via make_array_from_process_local_data
from probunet_tpu.parallel.mesh import batch_sharding  # noqa: E402
from probunet_tpu.train.loop import train_epoch  # noqa: E402


class _DS:
    def __init__(self, hr):
        self.hr = np.asarray(hr)

    def __len__(self):
        return len(self.hr)

    def get_hr_batch(self, idx):
        return self.hr[np.asarray(idx)]


ds = _DS(hr_stack)
state_e = replicate_global(create_train_state(model, x, x, seed=0), mesh)
state_e, summ = train_epoch(
    step, state_e, ds, stats_g, cfg, 1.0, 0.1, epoch=0,
    sharding=batch_sharding(mesh, spatial=False),
)
assert np.isfinite(summ["recon"])

if pid == 0:
    s1 = create_train_state(model, x, x, seed=0)
    s1, summ1 = train_epoch(step1, s1, ds, stats, cfg, 1.0, 0.1, epoch=0)
    assert abs(summ["recon"] - summ1["recon"]) <= 1e-4 * max(
        1.0, abs(summ1["recon"])
    ), (summ["recon"], summ1["recon"])
    for a, c in zip(jax.tree.leaves(s1.params),
                    jax.tree.leaves(state_e.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-3, atol=2e-5)
    print(f"MP_OK pid={pid} loss={loss:.6f} ref={loss1:.6f} "
          f"epoch_recon={summ['recon']:.6f} ref_epoch={summ1['recon']:.6f}",
          flush=True)
else:
    print(f"MP_OK pid={pid} loss={loss:.6f} "
          f"epoch_recon={summ['recon']:.6f}", flush=True)
