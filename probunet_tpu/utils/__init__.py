"""Utilities: plotting, profiling, misc training helpers."""

from probunet_tpu.utils.misc import l2_regularization, moving_average
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
    "l2_regularization",
    "moving_average",
]
