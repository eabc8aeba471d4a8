"""Diagonal-Gaussian latent math as pure functions.

Replaces the reference's ``torch.distributions Independent(Normal(...), 1)``
objects (reference src/prob_unet.py:84) and ``kl.kl_divergence`` calls
(src/prob_unet.py:255) with explicit, jit/vmap-friendly math:

- ``DiagGaussian`` is a NamedTuple of (mu, log_sigma) — a pytree, so it can
  flow through jit/vmap/grad without wrapper classes;
- ``sigma = exp(log_sigma) + 1e-7`` exactly as the reference constructs its
  Normal scale (src/prob_unet.py:84);
- reparameterized sampling threads explicit PRNG keys (replacing global torch
  seeding, reference src/main.py:15-26).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_SIGMA_EPS = 1e-7  # matches reference src/prob_unet.py:84


class DiagGaussian(NamedTuple):
    """Axis-aligned Gaussian over the last axis (the latent dimension)."""

    mu: jax.Array         # (..., D)
    log_sigma: jax.Array  # (..., D)

    @property
    def sigma(self) -> jax.Array:
        return jnp.exp(self.log_sigma) + _SIGMA_EPS

    def rsample(self, key: jax.Array, sample_shape: tuple[int, ...] = ()) -> jax.Array:
        """Reparameterized sample: mu + sigma * eps, eps ~ N(0, I)."""
        shape = sample_shape + self.mu.shape
        eps = jax.random.normal(key, shape, dtype=self.mu.dtype)
        return self.mu + self.sigma * eps

    def log_prob(self, x: jax.Array) -> jax.Array:
        """Log density, summed over the latent axis (Independent(..., 1))."""
        s = self.sigma
        z = (x - self.mu) / s
        return jnp.sum(
            -0.5 * z * z - jnp.log(s) - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1
        )

    @classmethod
    def standard(cls, like: "DiagGaussian") -> "DiagGaussian":
        """N(0, I) with matching shape — sigma becomes 1 + 1e-7 ≈ 1, matching
        the reference's ``scale=torch.ones_like(...)`` construction only up to
        the eps; we use exact zeros/ones in (mu, log(1 - eps)) space so that
        sigma == 1 exactly."""
        return cls(
            mu=jnp.zeros_like(like.mu),
            log_sigma=jnp.full_like(like.log_sigma, jnp.log(1.0 - _SIGMA_EPS)),
        )


def kl_diag_gaussians(q: DiagGaussian, p: DiagGaussian) -> jax.Array:
    """KL(q || p) for diagonal Gaussians, summed over the latent axis.

    Analytic form matching ``torch.distributions.kl.kl_divergence`` on
    Independent(Normal) (reference src/prob_unet.py:255,301):
      KL = log(sp/sq) + (sq^2 + (mq-mp)^2) / (2 sp^2) - 1/2,  summed over D.
    Returns shape q.mu.shape[:-1] (per-batch-element KL).
    """
    sq, sp = q.sigma, p.sigma
    var_ratio = (sq / sp) ** 2
    t1 = ((q.mu - p.mu) / sp) ** 2
    return 0.5 * jnp.sum(var_ratio + t1 - 1.0 - jnp.log(var_ratio), axis=-1)


def kl_to_standard_normal(q: DiagGaussian) -> jax.Array:
    """KL(q || N(0, I)) summed over latent axis (reference src/prob_unet.py:377)."""
    sq = q.sigma
    return 0.5 * jnp.sum(sq * sq + q.mu * q.mu - 1.0 - 2.0 * jnp.log(sq), axis=-1)
