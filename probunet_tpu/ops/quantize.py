"""int8 post-training quantization for the serving path (opt-in).

The ensemble/eval serve paths are HBM-bandwidth-bound (DESIGN.md
"Inference-path roofline"), and the v5e MXU has a 2x int8 MAC path. The
go/no-go probe (scripts/probe_int8.py, real chip) measured the flagship
conv shape at **1.45x** faster in int8 (29.8 TOPS vs 20.6 TF/s bf16,
chained requantized convs), so a quantized serving mode is worth its
plumbing. The reference has no quantization story (torch fp32 end to end)
— this is a framework extension, OFF unless a "quant" variable collection
is supplied.

Scheme (standard symmetric PTQ):

- **weights**: per-output-channel symmetric int8, quantized inside the
  jitted step from the float params (weights are KB-scale; requantizing
  per call costs nothing and avoids a second checkpoint format).
- **activations**: per-tensor symmetric int8 with STATIC scales measured
  by a calibration pass — dynamic (per-batch max) quantization would
  spend an extra reduction over exactly the bytes we are trying not to
  move.

Calibration protocol (no model-code changes needed at call sites):

    # 1. run the serve path with the "quant_stats" collection mutable;
    #    every quantizable conv sows its input absmax
    _, vs = model.apply({"params": params}, x, num_samples=M,
                        method=ProbabilisticUNet.sample,
                        rngs={"latent": key}, mutable=["quant_stats"])
    # (repeat over batches, folding with merge_stats)
    scales = quant_scales_from_stats(vs["quant_stats"])
    # 2. serve with the scales: every conv that finds its scale runs int8
    out = model.apply({"params": params, "quant": scales}, x, ...)

Hooks live in models/layers.py (EDMConv) and models/gaussian.py
(_Conv3x3); when neither collection is present both take their float path
untouched (the sown absmax is dead code that XLA eliminates).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

# quantizing to [-127, 127] (not -128) keeps the scheme symmetric: s = absmax/127
_QMAX = 127.0


def weight_scales(w: jax.Array) -> jax.Array:
    """Per-output-channel symmetric scales for a (..., cout) weight."""
    absmax = jnp.max(jnp.abs(w.reshape(-1, w.shape[-1]).astype(jnp.float32)), axis=0)
    return jnp.maximum(absmax, 1e-12) / _QMAX


def quantize_int8(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric int8 quantization: clip(round(x / scale)) in [-127, 127]."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8)


def int8_conv(x: jax.Array, w: jax.Array, in_scale: jax.Array, pad: int) -> jax.Array:
    """Quantized NHWC conv: int8 x int8 -> int32 on the MXU, rescaled to f32.

    ``x`` float (B,H,W,cin), ``w`` float (k,k,cin,cout), ``in_scale`` scalar
    (from calibration). Returns f32 (B,H,W,cout) = conv(x, w) up to
    quantization error.
    """
    s_w = weight_scales(w)                     # (cout,)
    w_q = quantize_int8(w, s_w[None, None, None, :])
    x_q = quantize_int8(x, in_scale)
    acc = lax.conv_general_dilated(
        x_q, w_q,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (in_scale.astype(jnp.float32) * s_w)


def sow_absmax(mod, x: jax.Array, name: str = "absmax") -> None:
    """Record the running absmax of a conv input during calibration.

    A no-op (dead code, DCE'd) unless the caller made "quant_stats"
    mutable. ``reduce_fn=maximum`` folds repeated calls (e.g. the M
    ensemble members hitting one conv) into a single running max. Skipped
    during ``init`` (where Flax makes every collection mutable) so model
    variables never carry a stray "quant_stats" tree.
    """
    if mod.is_initializing():
        return
    if mod.is_mutable_collection("quant_stats"):
        mod.sow("quant_stats", name,
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                reduce_fn=jnp.maximum, init_fn=lambda: jnp.float32(0.0))


_RENAME = {"absmax": "in_scale", "absmax2": "in_scale2"}


def quant_scales_from_stats(stats: Dict[str, Any]) -> Dict[str, Any]:
    """quant_stats tree (absmax leaves) -> "quant" collection (in_scale)."""
    def walk(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            else:
                # Floor like weight_scales: an all-zero calibration input
                # (absmax 0) must degrade to a harmless tiny scale, not a
                # 0/0 -> NaN inside quantize_int8 at serve time.
                out[_RENAME[k]] = jnp.maximum(
                    jnp.asarray(v, jnp.float32), 1e-12) / _QMAX
        return out

    return walk(jax.tree.map(lambda x: x, dict(stats)))


def merge_stats(a: Dict[str, Any], b: Dict[str, Any]) -> Dict[str, Any]:
    """Elementwise-max fold of two calibration stats trees (multi-batch)."""
    return jax.tree.map(jnp.maximum, a, b)


# --quant-skip alias: keep the latent distribution heads (prior/posterior
# conv_mu + conv_log_sigma, models/gaussian.py:149-152) in float. These
# 1x1 convs run on the (B, 1, 1, C) GAP output — quantizing them moves no
# meaningful bytes (the serve win is all in the spatial convs) but
# perturbs mu/log_sigma directly, and a log_sigma error exponentiates
# into ensemble spread: exactly the tail-sensitivity the full-scale GEV
# ledger exposed at pixel (96,20) (QUALITY.md "int8 serving accuracy
# ledger"). All risk, no reward — skip them.
SKIP_ALIASES = {"heads": r"conv_mu|conv_log_sigma"}


def quant_skip(scales: Dict[str, Any], patterns) -> Dict[str, Any]:
    """Prune calibrated scales whose module path matches any pattern.

    A conv whose scale is absent from the "quant" collection takes its
    float path (models/layers.py EDMConv, models/gaussian.py _Conv3x3) —
    so mixed-precision serving is pure tree pruning, no model changes.
    ``patterns``: regex strings searched against the "/"-joined module
    path (e.g. "prior/conv_mu"); the alias "heads" expands to
    ``SKIP_ALIASES["heads"]``. Empty subtrees are dropped so Flax never
    sees a module with a scale-less "quant" entry.
    """
    import re

    pats = [re.compile(SKIP_ALIASES.get(p, p)) for p in (patterns or [])]
    if not pats:
        return scales

    def walk(node, path):
        out = {}
        for k, v in node.items():
            p = f"{path}/{k}" if path else k
            if isinstance(v, dict):
                sub = walk(v, p)
                if sub:
                    out[k] = sub
            elif not any(r.search(p) for r in pats):
                out[k] = v
        return out

    return walk(scales, "")


def calibrate_sample(model, params, inputs_batches, num_samples: int,
                     key=None) -> Dict[str, Any]:
    """Calibrate the prior-sample serve path; returns the "quant" collection.

    Runs ``ProbabilisticUNet.sample`` (the path `evaluate`/`extremes`/
    `infer-domain` serve) over ``inputs_batches`` — already-preprocessed
    model inputs, a few serve batches are plenty for absmax PTQ — with the
    "quant_stats" collection mutable, folds the sown per-conv input absmax
    across batches, and converts to static scales. Serve with
    ``model.apply({"params": params, "quant": scales}, ...)``.
    """
    from probunet_tpu.models.prob_unet import ProbabilisticUNet

    if key is None:
        key = jax.random.key(0)

    @jax.jit
    def calib(x, k):
        _, vs = model.apply({"params": params}, x, num_samples=num_samples,
                            method=ProbabilisticUNet.sample,
                            rngs={"latent": k}, mutable=["quant_stats"])
        return vs["quant_stats"]

    stats = None
    for i, x in enumerate(inputs_batches):
        s = calib(x, jax.random.fold_in(key, i))
        stats = s if stats is None else merge_stats(stats, s)
    if stats is None:
        raise ValueError("calibrate_sample needs at least one batch")
    return quant_scales_from_stats(stats)


def calibrate_elbo(model, params, hr_batches, cfg, stats_std,
                   key=None) -> Dict[str, Any]:
    """Calibrate the no-grad posterior-ELBO eval path; returns "quant".

    The eval path (``train.loop.make_eval_step``) exercises a superset of
    the prior-sample serve path: UNet + prior + POSTERIOR convs. Runs the
    exact eval loss wiring (``make_elbo_loss_fn(training=False,
    collect_stats=True)``) over raw ``hr_batches``, folds the sown per-conv
    input absmax, and converts to static scales. Serve with
    ``make_eval_step(model, cfg, quant=scales)``.
    """
    from probunet_tpu.train.loop import make_elbo_loss_fn

    if key is None:
        key = jax.random.key(0)
    loss_fn = make_elbo_loss_fn(model, cfg, training=False,
                                collect_stats=True)

    @jax.jit
    def calib(p, hr, k):
        _, metrics = loss_fn(p, k, hr, stats_std,
                             jnp.float32(1.0), jnp.float32(0.0))
        return metrics["quant_stats"]

    stats = None
    for i, hr in enumerate(hr_batches):
        s = calib(params, hr, jax.random.fold_in(key, i))
        stats = s if stats is None else merge_stats(stats, s)
    if stats is None:
        raise ValueError("calibrate_elbo needs at least one batch")
    return quant_scales_from_stats(stats)
