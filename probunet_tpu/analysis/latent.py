"""Latent-space exploration: collection, PCA, grid decode, collapse probes.

Functional redesign of the reference's three exploration scripts:

- latent collection over a dataset (reference src/latent_exploration.py:
  647-653 collects prior means with a Python batch loop; here one jitted
  batched encode, vmapped over batches);
- StandardScaler+PCA (reference :699-708 uses sklearn; here a
  self-contained SVD PCA — same math, no dependency, runs from jnp or np);
- decile / ±k·sigma grids in PC1×PC2 inverted back to z-space
  (reference :84-113, :886-907);
- batched fcomb-only decode against the FROZEN features of one context
  (reference :119-144 — the efficient pattern this framework uses for all
  ensemble inference);
- the ten latent-collapse diagnostics (reference :192-603), returned as a
  plain dict + :func:`format_summary` writing the summary.txt analog
  (reference :924-976);
- the single-sample prior sweep over the top-2 highest-sigma latent dims
  (reference src/latent_explore_single_prior.py:177-193).
"""

from __future__ import annotations

import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.models.prob_unet import ProbabilisticUNet


# ---------------------------------------------------------------------------
# Latent collection
# ---------------------------------------------------------------------------

def collect_latents(
    model: ProbabilisticUNet,
    params,
    dataset,
    batch_size: int = 64,
    use_posterior: bool = False,
    max_items: int | None = None,
) -> dict[str, np.ndarray]:
    """Prior (or posterior) mu/sigma over a dataset -> {"mu": (N, D), "sigma": (N, D)}.

    The posterior variant additionally encodes the target residual, as in
    reference src/latent_exploration_posterior.py:254-263.
    """
    n = len(dataset) if max_items is None else min(max_items, len(dataset))

    @jax.jit
    def encode(hr_batch):
        batch = dataset.preprocess(hr_batch)
        target = batch["targets"] if use_posterior else None
        _, prior, post = model.apply(
            {"params": params}, batch["inputs"], target,
            method=ProbabilisticUNet.encode,
        )
        dist = post if use_posterior else prior
        return dist.mu, dist.sigma

    mus, sigmas = [], []
    for i in range(0, n, batch_size):
        idx = np.arange(i, min(i + batch_size, n))
        mu, sigma = encode(jnp.asarray(dataset.get_hr_batch(idx)))
        mus.append(np.asarray(mu))
        sigmas.append(np.asarray(sigma))
    return {"mu": np.concatenate(mus), "sigma": np.concatenate(sigmas)}


# ---------------------------------------------------------------------------
# PCA (StandardScaler + SVD)
# ---------------------------------------------------------------------------

class LatentPCA(NamedTuple):
    """StandardScaler + full PCA of latent means (reference
    src/latent_exploration.py:699-708). Skip PCA when D <= 2 by using
    ``identity=True`` semantics — components are then the raw axes."""

    mean: np.ndarray        # (D,) scaler mean
    std: np.ndarray         # (D,) scaler std
    components: np.ndarray  # (D, D) rows = principal axes in scaled space
    explained_variance_ratio: np.ndarray  # (D,)

    @classmethod
    def fit(cls, z: np.ndarray, whiten_eps: float = 1e-12) -> "LatentPCA":
        z = np.asarray(z, dtype=np.float64)
        mean = z.mean(axis=0)
        std = z.std(axis=0) + whiten_eps
        zs = (z - mean) / std
        d = z.shape[1]
        if d <= 2:
            comps = np.eye(d)
            var = zs.var(axis=0)
        else:
            # SVD PCA: rows of vt are principal axes
            _, s, vt = np.linalg.svd(zs - zs.mean(axis=0), full_matrices=False)
            comps = vt
            var = (s ** 2) / max(1, (zs.shape[0] - 1))
        ratio = var / var.sum() if var.sum() > 0 else np.zeros_like(var)
        return cls(mean, std, comps, ratio)

    def transform(self, z: np.ndarray) -> np.ndarray:
        zs = (np.asarray(z, np.float64) - self.mean) / self.std
        return zs @ self.components.T

    def inverse_transform(self, scores: np.ndarray) -> np.ndarray:
        zs = np.asarray(scores, np.float64) @ self.components
        return zs * self.std + self.mean


def pc_grid_deciles(scores: np.ndarray, n: int = 10) -> np.ndarray:
    """(n, n, 2) grid of (PC1, PC2) points at marginal deciles/quantiles
    (reference src/latent_exploration.py:886-897)."""
    qs = np.linspace(0.05, 0.95, n)
    p1 = np.quantile(scores[:, 0], qs)
    p2 = np.quantile(scores[:, 1], qs)
    g1, g2 = np.meshgrid(p1, p2, indexing="ij")
    return np.stack([g1, g2], axis=-1)


def pc_grid_sigma(scores: np.ndarray, n: int = 7, k: float = 3.0) -> np.ndarray:
    """(n, n, 2) grid spanning ±k standard deviations of PC1/PC2
    (reference src/latent_exploration.py:899-907)."""
    s1, s2 = scores[:, 0].std(), scores[:, 1].std()
    m1, m2 = scores[:, 0].mean(), scores[:, 1].mean()
    a = np.linspace(-k, k, n)
    g1, g2 = np.meshgrid(m1 + a * s1, m2 + a * s2, indexing="ij")
    return np.stack([g1, g2], axis=-1)


def grid_to_z(pca: LatentPCA, grid: np.ndarray, fill_scores=None) -> np.ndarray:
    """Invert an (n, n, 2) PC-grid to full z-space, holding other PCs at 0
    (or at ``fill_scores`` means). Returns (n*n, D)."""
    n1, n2, _ = grid.shape
    d = pca.components.shape[0]
    scores = np.zeros((n1 * n2, d))
    if fill_scores is not None:
        scores[:] = np.asarray(fill_scores).mean(axis=0)
    scores[:, 0] = grid[..., 0].reshape(-1)
    scores[:, 1] = grid[..., 1].reshape(-1)
    return pca.inverse_transform(scores)


# ---------------------------------------------------------------------------
# Grid decode against frozen features
# ---------------------------------------------------------------------------

def decode_latent_grid(
    model: ProbabilisticUNet,
    params,
    feats0: jax.Array,
    zs: np.ndarray,
    batch: int = 64,
) -> np.ndarray:
    """Decode many z vectors against the FROZEN U-Net features of one
    context (reference src/latent_exploration.py:119-144).

    feats0: (1, H, W, C) features of the chosen context sample;
    zs: (N, D). Returns residual-space decodes (N, H, W, num_classes).
    """
    @jax.jit
    def decode(z_chunk):
        # ensemble decode wants (M, B, D); B=1 context
        out = model.apply(
            {"params": params}, feats0, z_chunk[:, None, :],
            method=ProbabilisticUNet.decode,
        )  # (1, M, H, W, K)
        return out[0]

    outs = []
    zs = np.asarray(zs, np.float32)
    for i in range(0, zs.shape[0], batch):
        outs.append(np.asarray(decode(jnp.asarray(zs[i:i + batch]))))
    return np.concatenate(outs)


# ---------------------------------------------------------------------------
# Collapse diagnostics (the ten probes, reference :192-603)
# ---------------------------------------------------------------------------

def collapse_diagnostics(
    model: ProbabilisticUNet,
    params,
    dataset,
    batch_size: int = 32,
    num_samples: int = 16,
    max_items: int | None = 256,
    seed: int = 0,
    n_contexts: int = 32,
) -> dict:
    """Run the latent-collapse probe battery on a trained model.

    Returns a dict of scalar/vector diagnostics; see :func:`format_summary`
    for the human-readable report. Probes mirror reference
    src/latent_exploration.py:
      1. prior sigma spectrum (:192-226)
      2. extreme-z decode range (:229-257)
      3. per-dim z-sensitivity (:260-288)
      4. fcomb z-vs-feature weight norms (:290-299)
      5. reconstruction variance ratio (:302-327)
      6. 4-way feature/latent ablation (:330-419)
      7. output-vs-target stats (:422-457)
      8. grad-z / grad-feature ratio (:459-491)
      9. fcomb activation scale split (:493-603)
     10. mean KL(q||p) over the probe set

    Probes 5-10 aggregate over ``n_contexts`` items spread evenly across
    the dataset (the reference iterates its loaders over the test set for
    these, src/latent_exploration.py:302-327,459-491 — one context can
    mislead on a heterogeneous climate domain). ``n_contexts=1`` is the
    single-context fast path. Probes 2-3 (grid decodes against frozen
    features) stay on context 0, as in the reference (:119-144).
    """
    key = jax.random.key(seed)

    lat = collect_latents(model, params, dataset, batch_size,
                          use_posterior=False, max_items=max_items)
    sigma_spectrum = lat["sigma"].mean(axis=0)           # (D,)
    mu_spread = lat["mu"].std(axis=0)                    # (D,)

    # probe contexts: spread evenly over the dataset (or its max_items cap)
    n_avail = len(dataset) if max_items is None else min(max_items,
                                                         len(dataset))
    n_contexts = max(1, min(n_contexts, n_avail))
    idxs = np.unique(np.linspace(0, n_avail - 1, n_contexts).astype(int))
    hrs = jnp.asarray(dataset.get_hr_batch(idxs))
    batch = dataset.preprocess(hrs)
    x, y = batch["inputs"], batch["targets"]

    feats, prior, post = model.apply(
        {"params": params}, x, y, method=ProbabilisticUNet.encode
    )
    feats0 = feats[:1]
    mu0 = np.asarray(prior.mu[0])
    sig0 = np.asarray(prior.sigma[0])
    d = mu0.shape[0]

    def decode(zs):
        return decode_latent_grid(model, params, feats0, zs)

    # 2. extreme-z decode: output range at z = mu ± 10 sigma vs z = mu
    z_center = mu0[None]
    z_extreme = np.stack([mu0 + 10 * sig0, mu0 - 10 * sig0])
    dec_center = decode(z_center)
    dec_extreme = decode(z_extreme)
    extreme_delta = float(np.abs(dec_extreme - dec_center).max())

    # 3. per-dim sensitivity: |decode(mu + sigma_d e_d) - decode(mu)|
    z_pert = np.repeat(mu0[None], d, axis=0)
    z_pert[np.arange(d), np.arange(d)] += sig0
    sens = np.abs(decode(z_pert) - dec_center).mean(axis=(1, 2, 3))  # (D,)

    # 4. fcomb first-layer weight norms, feature block vs z block
    w1 = np.asarray(params["fcomb"]["layer0_weight"])[0, 0]
    c = w1.shape[0] - d
    feat_w_norm = float(np.linalg.norm(w1[:c]) / np.sqrt(c))
    z_w_norm = float(np.linalg.norm(w1[c:]) / np.sqrt(d))

    # 5. reconstruction variance ratio over the probe set: per-context
    # prior-ensemble variance / per-context target variance (reference
    # aggregates over its test loader, src/latent_exploration.py:302-327)
    samples = model.apply(
        {"params": params}, x, num_samples=num_samples,
        method=ProbabilisticUNet.sample, rngs={"latent": key},
    )  # (N, M, H, W, K)
    var_per_ctx = np.asarray(
        (samples.std(axis=1, ddof=1) ** 2).mean(axis=(1, 2, 3)))   # (N,)
    tgt_var_per_ctx = np.asarray(y.reshape(y.shape[0], -1).var(axis=1))
    ratio_per_ctx = var_per_ctx / np.maximum(tgt_var_per_ctx, 1e-12)
    var_ratio = float(var_per_ctx.mean() / max(tgt_var_per_ctx.mean(),
                                               1e-12))

    # 6. 4-way ablation in residual space over the probe set:
    # {feats, 0} x {z, 0}, each context decoding its own prior draw
    zeros_f = jnp.zeros_like(feats)
    z_samp = np.asarray(prior.rsample(jax.random.fold_in(key, 1)))  # (N, D)

    def decode_with(f, zs):
        out = model.apply(
            {"params": params}, f, jnp.asarray(zs, jnp.float32),
            method=ProbabilisticUNet.decode)  # zs (N, D) -> (N, H, W, K)
        return np.asarray(out)

    dec = {
        "feat_z": decode_with(feats, z_samp),
        "feat_z0": decode_with(feats, np.zeros_like(z_samp)),
        "feat0_z": decode_with(zeros_f, z_samp),
        "feat0_z0": decode_with(zeros_f, np.zeros_like(z_samp)),
    }
    ablation = {k: float(np.abs(v).mean()) for k, v in dec.items()}

    # 7. output-vs-target stats over the probe set
    out_mean = float(np.asarray(samples.mean()))
    out_std = float(np.asarray(samples.std()))
    tgt_mean = float(np.asarray(y.mean()))
    tgt_std = float(np.asarray(y.std()))

    # 8. gradient ratio ||d out / d z|| vs ||d out / d feats||, RMS over
    # the probe set (reference src/latent_exploration.py:459-491)
    def out_norm(f, z):
        o = model.apply({"params": params}, f, z,
                        method=ProbabilisticUNet.decode)
        return jnp.sum(o ** 2)

    z0j = jnp.asarray(z_samp)
    gf, gz = jax.grad(out_norm, argnums=(0, 1))(feats, z0j)
    grad_feat = float(jnp.linalg.norm(gf) / np.sqrt(np.prod(feats.shape)))
    grad_z = float(jnp.linalg.norm(gz) / np.sqrt(np.prod(z0j.shape)))
    grad_ratio = grad_z / max(grad_feat, 1e-12)

    # 9. fcomb activation scale split: |feat contribution| vs |z contribution|
    w1j = jnp.asarray(w1)
    feat_act = float(jnp.abs(jnp.dot(feats, w1j[:c])).mean())
    z_act = float(jnp.abs(jnp.dot(z0j, w1j[c:])).mean())

    # 10. mean KL(q||p) over the probe set
    from probunet_tpu.ops.distributions import kl_diag_gaussians
    kl0 = float(np.asarray(kl_diag_gaussians(post, prior)).mean())

    return {
        "latent_dim": d,
        "n_contexts": int(len(idxs)),
        "prior_sigma_spectrum": sigma_spectrum,
        "prior_mu_spread": mu_spread,
        "extreme_z_delta": extreme_delta,
        "z_sensitivity": sens,
        "fcomb_feat_weight_norm": feat_w_norm,
        "fcomb_z_weight_norm": z_w_norm,
        "sample_variance_ratio": var_ratio,
        "sample_variance_ratio_per_context": ratio_per_ctx,
        "ablation_mean_abs": ablation,
        "output_stats": {"mean": out_mean, "std": out_std},
        "target_stats": {"mean": tgt_mean, "std": tgt_std},
        "grad_ratio_z_over_feat": grad_ratio,
        "fcomb_activation_feat": feat_act,
        "fcomb_activation_z": z_act,
        "kl_q_p": kl0,
        "collapsed": bool(
            var_ratio < 1e-3 or grad_ratio < 1e-4 or extreme_delta < 1e-5
        ),
    }


def format_summary(diag: dict) -> str:
    """Human-readable collapse report — the summary.txt analog
    (reference src/latent_exploration.py:924-976)."""
    lines = [
        "latent collapse diagnostics",
        "=" * 40,
        f"latent_dim                 : {diag['latent_dim']}",
        f"probe contexts             : {diag.get('n_contexts', 1)}",
        f"prior sigma (mean/min/max) : "
        f"{diag['prior_sigma_spectrum'].mean():.4g} / "
        f"{diag['prior_sigma_spectrum'].min():.4g} / "
        f"{diag['prior_sigma_spectrum'].max():.4g}",
        f"prior mu spread (mean)     : {diag['prior_mu_spread'].mean():.4g}",
        f"extreme-z output delta     : {diag['extreme_z_delta']:.4g}",
        f"z sensitivity (mean/max)   : {diag['z_sensitivity'].mean():.4g} / "
        f"{diag['z_sensitivity'].max():.4g}",
        f"fcomb weight norm feat/z   : {diag['fcomb_feat_weight_norm']:.4g} / "
        f"{diag['fcomb_z_weight_norm']:.4g}",
        f"sample/target var ratio    : {diag['sample_variance_ratio']:.4g}"
        + (
            "  (per-context min/max "
            f"{np.min(diag['sample_variance_ratio_per_context']):.3g}/"
            f"{np.max(diag['sample_variance_ratio_per_context']):.3g})"
            if "sample_variance_ratio_per_context" in diag else ""
        ),
        f"grad ratio (z/feat)        : {diag['grad_ratio_z_over_feat']:.4g}",
        f"fcomb activation feat/z    : {diag['fcomb_activation_feat']:.4g} / "
        f"{diag['fcomb_activation_z']:.4g}",
        f"KL(q||p) probe context     : {diag['kl_q_p']:.4g}",
        "ablation mean|out|:",
    ]
    for k, v in diag["ablation_mean_abs"].items():
        lines.append(f"  {k:10s}: {v:.4g}")
    lines.append(
        "VERDICT: LATENT COLLAPSE SUSPECTED" if diag["collapsed"]
        else "VERDICT: latent space active"
    )
    return "\n".join(lines)


def save_artifacts(path: str, pca: LatentPCA, latents: dict, diag: dict):
    """Persist PCA + latents + diagnostics (the pca_artifacts.pkl analog,
    reference src/latent_exploration.py:924-976)."""
    with open(path, "wb") as f:
        pickle.dump({"pca": pca._asdict(), "latents": latents,
                     "diagnostics": diag}, f)


# ---------------------------------------------------------------------------
# Single-sample prior sweep
# ---------------------------------------------------------------------------

def single_prior_sweep(
    model: ProbabilisticUNet,
    params,
    dataset,
    item: int = 0,
    n: int = 6,
    span: float = 6.0,
) -> dict:
    """Sweep the top-2 highest-sigma latent dims over ±span·sigma for ONE
    test sample, others held at mu (reference
    src/latent_explore_single_prior.py:177-193).

    Returns {"dims", "grid_z", "decoded", "center"} with decoded
    (n, n, H, W, K) residual fields and the center decode for delta plots.
    """
    hr = jnp.asarray(dataset.get_hr_batch(np.array([item])))
    batch = dataset.preprocess(hr)
    feats, prior, _ = model.apply(
        {"params": params}, batch["inputs"], method=ProbabilisticUNet.encode
    )
    mu = np.asarray(prior.mu[0])
    sigma = np.asarray(prior.sigma[0])
    top2 = np.argsort(sigma)[::-1][:2]

    a = np.linspace(-span, span, n)
    zs = np.repeat(mu[None], n * n, axis=0)
    g1, g2 = np.meshgrid(a, a, indexing="ij")
    zs[:, top2[0]] = mu[top2[0]] + g1.reshape(-1) * sigma[top2[0]]
    zs[:, top2[1]] = mu[top2[1]] + g2.reshape(-1) * sigma[top2[1]]

    decoded = decode_latent_grid(model, params, feats, zs)
    center = decode_latent_grid(model, params, feats, mu[None])[0]
    h, w, k = decoded.shape[1:]
    return {
        "dims": top2,
        "sigma": sigma,
        "grid_z": zs.reshape(n, n, -1),
        "decoded": decoded.reshape(n, n, h, w, k),
        "center": center,
    }
