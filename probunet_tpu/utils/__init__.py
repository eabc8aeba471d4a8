"""Utilities: plotting, profiling, seeding."""

from probunet_tpu.utils.plotting import (
    plot_batch,
    plot_loss_curves,
    plot_psd,
    plot_residual_differences,
    plot_residual_sample_batch,
    plot_return_levels,
    plot_sample_batch,
    plot_latent_grid,
)

__all__ = [
    "plot_batch",
    "plot_sample_batch",
    "plot_residual_sample_batch",
    "plot_residual_differences",
    "plot_loss_curves",
    "plot_psd",
    "plot_return_levels",
    "plot_latent_grid",
]
