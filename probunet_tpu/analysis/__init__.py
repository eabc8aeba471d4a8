"""Latent-space exploration & collapse diagnostics.

TPU-native redesign of the reference's latent exploration scripts
(reference src/latent_exploration.py, src/latent_exploration_posterior.py,
src/latent_explore_single_prior.py — SURVEY.md §2.4/§3.4): batched latent
collection, PCA, grid decoding against frozen U-Net features, and the ten
latent-collapse probes, all as library functions instead of monolithic
scripts.
"""

from probunet_tpu.analysis.latent import (
    LatentPCA,
    collapse_diagnostics,
    collect_latents,
    decode_latent_grid,
    format_summary,
    pc_grid_deciles,
    pc_grid_sigma,
    single_prior_sweep,
)

__all__ = [
    "collect_latents",
    "LatentPCA",
    "pc_grid_deciles",
    "pc_grid_sigma",
    "decode_latent_grid",
    "collapse_diagnostics",
    "format_summary",
    "single_prior_sweep",
]
