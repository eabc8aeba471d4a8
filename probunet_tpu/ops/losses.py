"""Reconstruction losses for probabilistic downscaling.

TPU-first re-implementations of the reference loss zoo:

- ``afcrps_loss`` — almost-fair CRPS (reference src/prob_unet_utils.py:171-234).
  Two equivalent formulations, dispatched on the static ensemble size M:

  * **pairwise** (M <= _PAIRWISE_MAX_M, the training regime): the literal
    O(M^2) sum. XLA fuses the (B, M, M, P) |x_j - x_k| tensor into the
    reduction (nothing is materialized — unlike the reference, which holds
    the full [B, M, M, C, H, W] tensor, ~1.4 GB at B=32 M=15); both the
    forward and the backward are pure elementwise VPU work. Measured on
    v5e at B=64, M=15, 128x128x3: fwd 10 ms, fwd+bwd 24 ms.
  * **sorted** (large M): the exact identity
        sum_{j<k} |x_j - x_k| = sum_i (2i - M + 1) * x_(i)
    (ascending sort over M) — O(M log M) time, O(M) memory per pixel.
    NEVER differentiate through this form: the sort's vjp is a scatter,
    which measured 577 ms for the SAME gradient the pairwise form gets
    in 24 ms. It is the right form for forward-only evaluation at large M
    and the numerical oracle for the pairwise one.
- ``crps_loss`` — plain ensemble CRPS (reference src/prob_unet_utils.py:237-268),
  same dual formulation.
- ``crps_empirical`` — the Pyro sort-based per-element CRPS used by the
  deterministic stack (reference src/trainmodel.py:66-110).
- ``wmse_ms_ssim_loss`` — lambda*WMSE + (1-lambda)*(1 - MS-SSIM)
  (reference src/prob_unet_utils.py:270-305), with MS-SSIM from
  :mod:`probunet_tpu.ops.msssim`.

Shape conventions: ensembles are ``(B, M, *spatial)``, targets ``(B, *spatial)``
where ``*spatial`` is any trailing layout (NHWC or NCHW both work — reductions
cover all trailing axes).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _flatten_spatial(x: jax.Array, lead: int) -> jax.Array:
    """Collapse all axes after the first `lead` into one."""
    return x.reshape(*x.shape[:lead], -1)


# Above this ensemble size the O(M log M) sorted form wins over the O(M^2)
# pairwise form (crossover measured on v5e; at the reference's M=15 the
# pairwise form is faster in fwd AND ~24x faster through grad).
_PAIRWISE_MAX_M = 32


def _pairwise_abs_sum(ens: jax.Array) -> jax.Array:
    """sum_{j<k} |x_j - x_k| along axis 1 of (B, M, P), reduced over M and P;
    returns (B,). Elementwise O(M^2) — XLA fuses it, nothing materializes,
    and the gradient is elementwise sign() work (no scatter)."""
    diff = jnp.abs(ens[:, :, None, :] - ens[:, None, :, :])  # fused
    return 0.5 * jnp.sum(diff, axis=(1, 2, 3))


def _pairwise_abs_sum_sorted(ens: jax.Array) -> jax.Array:
    """sum_{j<k} |x_j - x_k| along axis 1 of (B, M, P), reduced over M and P.

    Uses the sorted identity; returns shape (B,). Forward-only/large-M path —
    do not differentiate through it (sort vjp = scatter; see module docs).
    """
    m = ens.shape[1]
    srt = jnp.sort(ens, axis=1)
    coeff = (2.0 * jnp.arange(m, dtype=ens.dtype) - (m - 1)).reshape(1, m, 1)
    return jnp.sum(srt * coeff, axis=(1, 2))


def _ensemble_spread_sum(ens: jax.Array) -> jax.Array:
    """Dispatch between the pairwise and sorted forms on static M."""
    if ens.shape[1] <= _PAIRWISE_MAX_M:
        return _pairwise_abs_sum(ens)
    return _pairwise_abs_sum_sorted(ens)


def _crps_impl() -> str:
    """Which formulation computes the CRPS terms: "pallas" (fused kernel,
    the single-chip TPU default), or "xla". Override with PROBUNET_CRPS_IMPL.

    NOTE (trace-time capture): this is read while the enclosing loss is being
    *traced* under jit — changing the env var later in the same process has no
    effect on already-compiled steps (the jit cache keeps the first-traced
    implementation). For in-process A/B comparisons call ``.clear_cache()`` on
    the jitted function or use fresh processes (bench.py does the latter).

    Multi-device: a bare pallas_call carries no partitioning spec, so under
    a multi-chip GSPMD mesh XLA would replicate the full (B, M, P) ensemble
    on every chip. ``auto`` therefore selects the kernel on TPU when either
    (a) exactly one device is visible, or (b) the parallel step builders
    registered a kernel mesh (ops/pallas/partition.py) — then the kernel
    runs shard_map-wrapped on each chip's local shard
    (:func:`~probunet_tpu.ops.pallas.afcrps.ensemble_crps_terms_partitioned`).
    A multi-device run with NO registered mesh uses the XLA pairwise form
    (which GSPMD partitions freely and which ties with the kernel on v5e —
    see ops/pallas/__init__.py). Forcing ``pallas`` is at your own risk.
    """
    import os

    impl = os.environ.get("PROBUNET_CRPS_IMPL", "auto")
    if impl == "auto":
        if jax.default_backend() != "tpu":
            return "xla"
        from probunet_tpu.ops.pallas.partition import kernel_mesh_is_active

        if len(jax.devices()) == 1 or kernel_mesh_is_active():
            return "pallas"
        return "xla"
    return impl


def _crps_terms(ens: jax.Array, tgt: jax.Array):
    """(t1, t2) = (sum_j |x_j - y|, sum_{j<k} |x_j - x_k|) per batch elem.

    ens (B, M, P), tgt (B, 1, P). The fused Pallas kernel
    (ops.pallas.afcrps) reads the ensemble once per term with an analytic
    backward; the XLA path is the pairwise/sorted dispatch above.
    """
    if _crps_impl() == "pallas" and ens.shape[1] >= 2:
        from probunet_tpu.ops.pallas.afcrps import (
            ensemble_crps_terms_partitioned,
        )

        return ensemble_crps_terms_partitioned(ens, tgt[:, 0, :])
    t1 = jnp.sum(jnp.abs(ens - tgt), axis=(1, 2))
    return t1, _ensemble_spread_sum(ens)


def afcrps_from_terms(t1: jax.Array, t2: jax.Array, m: int, p: int,
                      alpha: float = 0.95) -> jax.Array:
    """Batch-mean afCRPS from per-batch terms (t1, t2) — the single home of
    the combination algebra (reference src/prob_unet_utils.py:171-234),
    shared by :func:`afcrps_loss` and the fused fcomb-CRPS kernel
    (ops/pallas/fcomb_crps.py) so the two paths cannot drift."""
    eps = (1.0 - alpha) / m
    total = 2.0 * (m - 1) * t1 - (1.0 - eps) * 2.0 * t2
    return (total / (2.0 * m * (m - 1)) / p).mean()


def crps_from_terms(t1: jax.Array, t2: jax.Array, m: int, p: int) -> jax.Array:
    """Batch-mean ensemble CRPS from per-batch terms (t1, t2) — shared
    combination algebra (reference src/prob_unet_utils.py:237-268)."""
    first = t1 / m
    second = 2.0 * t2 / (m * m)                                # ordered pairs
    return ((first - 0.5 * second) / p).mean()


def afcrps_loss(ensemble: jax.Array, target: jax.Array, alpha: float = 0.95) -> jax.Array:
    """Almost-fair CRPS, scalar mean over batch.

    afCRPS = 1/[2M(M-1)] * sum_{j != k} (|x_j - y| + |x_k - y| - (1-eps)|x_j - x_k|)
    with eps = (1 - alpha)/M, normalized per pixel — exactly the quantity of
    reference src/prob_unet_utils.py:171-234, computed without the M^2 tensor:
      sum_{j != k} (|x_j-y| + |x_k-y|)  == 2(M-1) sum_j |x_j - y|
      sum_{j != k} |x_j - x_k|          == 2 sum_{j<k} |x_j - x_k|  (sorted form)
    """
    b, m = ensemble.shape[0], ensemble.shape[1]
    if m < 2:
        raise ValueError(f"M must be >= 2 for afCRPS, got M={m}")
    p = math.prod(ensemble.shape[2:])

    ens = _flatten_spatial(ensemble, 2)            # (B, M, P)
    tgt = _flatten_spatial(target, 1)[:, None, :]  # (B, 1, P)

    term_y, term_pair = _crps_terms(ens, tgt)                 # (B,), (B,)
    return afcrps_from_terms(term_y, term_pair, m, p, alpha)


def afcrps_loss_pairwise(
    ensemble: jax.Array, target: jax.Array, alpha: float = 0.95
) -> jax.Array:
    """Literal O(M^2) afCRPS — golden oracle mirroring the reference tensor
    algebra (src/prob_unet_utils.py:197-234). Test use only."""
    b, m = ensemble.shape[0], ensemble.shape[1]
    eps = (1.0 - alpha) / m
    p = math.prod(ensemble.shape[2:])
    ens = _flatten_spatial(ensemble, 2)
    tgt = _flatten_spatial(target, 1)[:, None, :]

    xy = jnp.abs(ens - tgt)                                   # (B, M, P)
    term_jy_ky = xy[:, :, None, :] + xy[:, None, :, :]        # (B, M, M, P)
    term_jk = (1.0 - eps) * jnp.abs(ens[:, :, None, :] - ens[:, None, :, :])
    combined = term_jy_ky - term_jk
    mask = (1.0 - jnp.eye(m, dtype=ensemble.dtype)).reshape(1, m, m, 1)
    s = jnp.sum(combined * mask, axis=(1, 2, 3))
    return (s / (2.0 * m * (m - 1)) / p).mean()


def crps_loss(ensemble: jax.Array, target: jax.Array) -> jax.Array:
    """Ensemble CRPS: E|x - y| - 0.5 E|x - x'| over all ordered pairs,
    averaged over batch and pixels (reference src/prob_unet_utils.py:237-268),
    via the sorted pairwise identity."""
    m = ensemble.shape[1]
    p = math.prod(ensemble.shape[2:])
    ens = _flatten_spatial(ensemble, 2)
    tgt = _flatten_spatial(target, 1)[:, None, :]

    t1, t2 = _crps_terms(ens, tgt)
    return crps_from_terms(t1, t2, m, p)


def crps_loss_pairwise(ensemble: jax.Array, target: jax.Array) -> jax.Array:
    """Literal O(M^2) CRPS oracle (reference src/prob_unet_utils.py:254-268)."""
    m = ensemble.shape[1]
    ens = _flatten_spatial(ensemble, 2)
    tgt = _flatten_spatial(target, 1)[:, None, :]
    first = jnp.abs(ens - tgt).mean(axis=1)                     # (B, P)
    pair = jnp.abs(ens[:, :, None, :] - ens[:, None, :, :])     # (B, M, M, P)
    second = pair.mean(axis=(1, 2))                             # (B, P)
    return (first - 0.5 * second).mean()


def crps_empirical(pred: jax.Array, truth: jax.Array) -> jax.Array:
    """Pyro-style sort-based per-element CRPS (reference src/trainmodel.py:66-110).

    pred: (num_samples, *truth.shape); returns array of truth.shape.
    """
    n = pred.shape[0]
    if n == 1:
        return jnp.abs(pred[0] - truth)
    srt = jnp.sort(pred, axis=0)
    diff = srt[1:] - srt[:-1]
    weight = (
        jnp.arange(1, n, dtype=pred.dtype)
        * jnp.arange(n - 1, 0, -1, dtype=pred.dtype)
    ).reshape((n - 1,) + (1,) * truth.ndim)
    return jnp.abs(pred - truth).mean(axis=0) - jnp.sum(diff * weight, axis=0) / n**2


def wmse_weights(target: jax.Array, alpha: float = 0.007, beta: float = 0.048):
    """w(y) = min(alpha * exp(beta * y), 1) (reference src/prob_unet_utils.py:292)."""
    return jnp.clip(alpha * jnp.exp(beta * target), max=1.0)


def wmse_ms_ssim_loss(
    pred: jax.Array,
    target: jax.Array,
    alpha: float = 0.007,
    beta: float = 0.048,
    lam: float = 0.0,
    return_components: bool = False,
    data_range=None,
):
    """lambda*WMSE + (1-lambda)*(1 - MS-SSIM) (reference src/prob_unet_utils.py:270-305).

    pred/target: (B, H, W, C) NHWC; a 5-D ensemble (B, M, H, W, C) collapses to
    its mean, as in the reference (:285-286). data_range defaults to the
    per-call target max-min clamped to >= 1e-5 (:288-289).
    """
    from probunet_tpu.ops.msssim import ms_ssim

    if pred.ndim == 5:
        pred = pred.mean(axis=1)
    if data_range is None:
        data_range = jnp.clip(target.max() - target.min(), min=1e-5)

    w = wmse_weights(target, alpha=alpha, beta=beta)
    wmse = jnp.mean(w * (pred - target) ** 2)

    msssim_val = ms_ssim(pred, target, data_range=data_range, win_size=7)
    msssim_loss = 1.0 - msssim_val

    combined = lam * wmse + (1.0 - lam) * msssim_loss
    if return_components:
        return combined, wmse, msssim_loss
    return combined


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean absolute error (the original L1 ELBO recon term,
    reference src/prob_unet.py:359-362)."""
    return jnp.mean(jnp.abs(pred - target))


def l1_loss_per_channel(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-channel (last axis, NHWC) L1 for logging
    (reference src/prob_unet.py:357-360 logs per-variable L1)."""
    return jnp.mean(jnp.abs(pred - target), axis=tuple(range(pred.ndim - 1)))
