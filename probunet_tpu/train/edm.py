"""EDM diffusion training and sampling.

The reference ships ``EDMPrecond`` but never trains it (reference
src/baseline/deterministic_unet.py:337-387; no driver — SURVEY.md §2.2).
This module completes the family as a conditional diffusion downscaler:
the denoiser learns the standardized HR residual given the interpolated LR
field as conditioning, so sampling produces downscaling ensembles exactly
like the Prob-U-Net path (same preprocess / residual_to_hr plumbing).

Formulation follows Karras et al. 2022 ("Elucidating the Design Space of
Diffusion-Based Generative Models"):

- training: sigma ~ LogNormal(P_mean, P_std), lambda(sigma) =
  (sigma^2 + sigma_data^2) / (sigma * sigma_data)^2,
  loss = lambda * ||D(y + sigma*eps; sigma, cond) - y||^2;
- sampling: 2nd-order Heun integration over the EDM sigma schedule
  sigma_i = (smax^(1/rho) + i/(N-1)(smin^(1/rho) - smax^(1/rho)))^rho.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from probunet_tpu.config import Config
from probunet_tpu.data.climex import preprocess_batch
from probunet_tpu.train.loop import optax_global_norm
from probunet_tpu.train.state import TrainState


def edm_loss(
    model,
    params,
    rng: jax.Array,
    target: jax.Array,
    condition: jax.Array | None = None,
    sigma_data: float = 1.0,
    p_mean: float = -1.2,
    p_std: float = 1.2,
    train: bool = True,
):
    """EDM denoising loss over one batch. target (B, H, W, C)."""
    sig_rng, eps_rng, drop_rng = jax.random.split(rng, 3)
    b = target.shape[0]
    log_sigma = p_mean + p_std * jax.random.normal(sig_rng, (b,))
    sigma = jnp.exp(log_sigma).reshape(-1, 1, 1, 1)
    weight = (sigma**2 + sigma_data**2) / (sigma * sigma_data) ** 2
    noise = sigma * jax.random.normal(eps_rng, target.shape, target.dtype)
    denoised = model.apply(
        {"params": params}, target + noise, sigma.reshape(-1),
        condition_img=condition, train=train,
        rngs={"dropout": drop_rng},
    )
    return jnp.mean(weight * (denoised - target) ** 2)


def make_edm_train_step(model, cfg: Config, donate: bool = True) -> Callable:
    """Jitted conditional-diffusion train step on the residual pipeline:
    step(state, hr_batch, stats) -> (state, metrics). The condition is the
    standardized lrinterp (the model input of the reference's pipelines)."""
    data_cfg = cfg.data

    def loss_fn(params, rng, hr_batch, stats):
        batch = preprocess_batch(
            hr_batch, stats, data_cfg.pipeline, data_cfg.lowres_scale,
            data_cfg.interp_mode, data_cfg.epsilon, data_cfg.standardization,
        )
        return edm_loss(model, params, rng, batch["targets"],
                        condition=batch["inputs"], train=True)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, hr_batch, stats):
        rng = jax.random.fold_in(state.rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, rng, hr_batch, stats
        )
        new_state = state.apply_gradients(grads=grads)
        return new_state, {"loss": loss, "grad_norm": optax_global_norm(grads)}

    return step


def edm_sample(
    model,
    params,
    rng: jax.Array,
    shape: tuple,
    condition: jax.Array | None = None,
    num_steps: int = 18,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
) -> jax.Array:
    """Deterministic 2nd-order (Heun) EDM sampler.

    shape = (B, H, W, C) of the field to generate. Returns denoised samples
    in target (residual) space; feed through ``residual_to_hr`` for fields.
    """
    i = jnp.arange(num_steps)
    sigmas = (
        sigma_max ** (1 / rho)
        + i / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
    ) ** rho
    sigmas = jnp.concatenate([sigmas, jnp.zeros((1,))])  # sigma_N = 0

    def denoise(x, sigma):
        s = jnp.full((shape[0],), sigma)
        return model.apply({"params": params}, x, s, condition_img=condition)

    x = sigmas[0] * jax.random.normal(rng, shape)

    def body(carry, idx):
        x = carry
        s_cur, s_next = sigmas[idx], sigmas[idx + 1]
        d_cur = (x - denoise(x, s_cur)) / s_cur
        x_euler = x + (s_next - s_cur) * d_cur
        # Heun correction except on the final step to sigma=0
        def heun(_):
            d_next = (x_euler - denoise(x_euler, s_next)) / s_next
            return x + (s_next - s_cur) * 0.5 * (d_cur + d_next)
        x_new = jax.lax.cond(s_next > 0, heun, lambda _: x_euler, None)
        return x_new, None

    x, _ = jax.lax.scan(body, x, jnp.arange(num_steps))
    return x


def edm_ensemble(
    model, params, rng: jax.Array, shape: tuple,
    condition: jax.Array | None, num_members: int, **kwargs
) -> jax.Array:
    """(B, M, H, W, C) diffusion ensemble: vmapped sampler over member keys
    with shared conditioning."""
    keys = jax.random.split(rng, num_members)
    fn = lambda k: edm_sample(model, params, k, shape, condition, **kwargs)  # noqa: E731
    out = jax.vmap(fn)(keys)                     # (M, B, H, W, C)
    return jnp.swapaxes(out, 0, 1)
