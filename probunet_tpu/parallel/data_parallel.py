"""Mesh-sharded train/eval steps (data parallel, optional spatial sharding).

The reference trains on exactly one device (reference src/prob_unet.py:10,
src/main.py no distributed setup — SURVEY.md §2.5 P1). Here the SAME jitted
ELBO step from ``probunet_tpu.train.loop`` is compiled with explicit
``NamedSharding``s over a ("data", "spatial") mesh:

- the raw HR batch is sharded batch-over-"data" and rows-over-"spatial";
- params / optimizer state / stats are replicated;
- requesting replicated gradients from per-shard data makes XLA/GSPMD insert
  the all-reduce (psum over ICI) — no hand-written collectives;
- with n_spatial > 1 GSPMD spatially partitions the convolutions, inserting
  halo exchanges, so one 128x128 (or full-domain) tile's activations can be
  split across chips' HBM.

Multi-host: call ``jax.distributed.initialize()`` first, build the mesh over
``jax.devices()`` (all hosts), and feed per-host shards via
``jax.make_array_from_process_local_data`` with :func:`global_batch_sharding`.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from probunet_tpu.config import Config
from probunet_tpu.ops.pallas.partition import set_kernel_mesh
from probunet_tpu.train.loop import make_elbo_loss_fn, optax_global_norm
from probunet_tpu.train.state import TrainState
from probunet_tpu.utils.compile_opts import tuned_compiler_options


def _shardings(mesh: Mesh, spatial: bool):
    repl = NamedSharding(mesh, P())
    if spatial:
        batch = NamedSharding(mesh, P("data", "spatial", None, None))
    else:
        batch = NamedSharding(mesh, P("data"))
    return repl, batch


def make_parallel_train_step(
    model,
    cfg: Config,
    mesh: Mesh,
    donate: bool = True,
    spatial: bool | None = None,
) -> Callable:
    """jit the ELBO train step over ``mesh``.

    step(state, hr_batch, stats, beta_0, beta_1) -> (state, metrics)

    state/stats replicated, hr_batch sharded (B over "data", H over
    "spatial" when the mesh has a nontrivial spatial axis).
    """
    if spatial is None:
        spatial = mesh.shape.get("spatial", 1) > 1
    repl, batch_sh = _shardings(mesh, spatial)
    # register the mesh for the Pallas loss kernels: a bare pallas_call is
    # an opaque custom call GSPMD cannot partition, so the loss wraps it in
    # shard_map over this mesh (ops/pallas/partition.py; trace-time capture,
    # last-registered mesh wins — one mesh per process is the supported use)
    set_kernel_mesh(mesh)
    loss_fn = make_elbo_loss_fn(model, cfg)

    @partial(
        jax.jit,
        in_shardings=(repl, batch_sh, repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
        compiler_options=tuned_compiler_options(),
    )
    def step(state: TrainState, hr_batch, stats, beta_0, beta_1):
        rng = jax.random.fold_in(state.rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, rng, hr_batch, stats, beta_0, beta_1
        )
        new_state = state.apply_gradients(grads=grads)
        out = {
            "loss": loss,
            "recon": metrics["recon"],
            "kl_mean": metrics["kl_mean"],
            "grad_norm": optax_global_norm(grads),
        }
        return new_state, out

    return step


def make_parallel_eval_step(
    model,
    cfg: Config,
    mesh: Mesh,
    spatial: bool | None = None,
) -> Callable:
    """Mesh-sharded no-grad ELBO eval: (params, rng, hr_batch, stats) -> metrics."""
    if spatial is None:
        spatial = mesh.shape.get("spatial", 1) > 1
    repl, batch_sh = _shardings(mesh, spatial)
    set_kernel_mesh(mesh)  # see make_parallel_train_step
    # eval uses M=eval_ensemble_size and beta weights (1, 0) like the
    # reference eval loop (reference src/train_prob_unet_model.py:161-210)
    eval_loss_fn = make_elbo_loss_fn(model, cfg, training=False)

    @partial(
        jax.jit,
        in_shardings=(repl, repl, batch_sh, repl),
        out_shardings=repl,
        compiler_options=tuned_compiler_options(),
    )
    def step(params, rng, hr_batch, stats):
        total, metrics = eval_loss_fn(
            params, rng, hr_batch, stats,
            jnp.float32(1.0), jnp.float32(0.0),
        )
        return {"loss": total, "recon": metrics["recon"],
                "kl_mean": metrics["kl_mean"]}

    return step
