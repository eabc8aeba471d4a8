"""Train state: params + optimizer + step + PRNG, one pytree.

Replaces the reference's scattered mutable state (model attributes, a global
torch seed at src/main.py:15-26, optimizer object at src/main.py:103) with a
single immutable pytree that is the input/output of the jitted step and the
unit of checkpointing (params, opt_state, step, rng — everything needed for
exact resume, which the reference cannot do mid-training; SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState + threaded PRNG key.

    The per-step rng is derived as fold_in(rng, step) inside the jitted step,
    so resuming from a checkpoint reproduces the same sample sequence.
    """

    rng: jax.Array = struct.field(pytree_node=True, default=None)


def make_optimizer(
    lr: float = 1e-4, weight_decay: float = 0.01, grad_clip: float = 0.0,
    accum: int = 1,
) -> optax.GradientTransformation:
    """AdamW with torch-default hyperparameters (betas 0.9/0.999, eps 1e-8,
    weight_decay 0.01 — the reference uses torch.optim.AdamW defaults,
    src/train_prob_unet_model.py:53, src/main.py:103).

    ``accum > 1`` wraps the transform in :class:`optax.MultiSteps`: gradients
    of `accum` micro-batches are averaged before one AdamW update (the
    reference's --accum semantics, src/trainmodel.py:180-181), so effective
    batch ``accum * batch_size`` trains in the HBM footprint of ONE
    micro-batch — e.g. effective bs=512 at M=15 on a 16 GB chip, where a
    single bs=256 step already OOMs.
    """
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def create_train_state(
    model: Any,
    example_inputs,
    example_targets,
    seed: int = 42,
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    grad_clip: float = 0.0,
    accum: int = 1,
    init_method=None,
    rng_impl: str = "rbg",
) -> TrainState:
    """Initialize parameters and optimizer for a ProbabilisticUNet-style model.

    ``rng_impl`` selects the PRNG for the whole training stream (init,
    latent sampling, dropout). "rbg" rides the TPU hardware RNG — the
    flagship step's dropout masks cost ~39 ms/step less than with the
    threefry default; it is deterministic and fold_in/split-compatible.
    """
    key = jax.random.key(seed, impl=rng_impl)
    init_key, latent_key, state_key = jax.random.split(key, 3)

    # jit the whole init: flax init runs op-by-op eagerly otherwise, which is
    # hundreds of small dispatches (pathological over remote-device links)
    @jax.jit
    def init_fn(rngs, x, y):
        kwargs = {} if init_method is None else {"method": init_method}
        return model.init(rngs, x, y, **kwargs)

    variables = init_fn(
        {"params": init_key, "latent": latent_key},
        example_inputs,
        example_targets,
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=make_optimizer(lr, weight_decay, grad_clip, accum),
        rng=state_key,
    )
