"""EDM preconditioning wrapper (reference src/baseline/deterministic_unet.py:337-387).

Wraps a U-Net with the EDM c_skip/c_out/c_in/c_noise scalings; supports an
optional conditioning image concatenated on the channel axis. Diffusion-ready
like the reference (no training script drives it there either — parity
capability, exercised by tests).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from probunet_tpu.models.unet import UNet


class EDMPrecond(nn.Module):
    img_resolution: Tuple[int, int]
    in_channels: int
    out_channels: int
    label_dim: int = 0
    sigma_min: float = 0.0
    sigma_max: float = float("inf")
    sigma_data: float = 1.0
    model_channels: int = 64
    channel_mult: Sequence[int] = (1, 2, 3, 4)
    num_blocks: int = 2
    dropout: float = 0.10
    use_diffuse: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, sigma, condition_img=None, class_labels=None,
                 train: bool = False):
        in_img = (
            jnp.concatenate([x, condition_img], axis=-1)
            if condition_img is not None
            else x
        )
        sigma = jnp.reshape(sigma, (-1, 1, 1, 1)).astype(jnp.float32)

        c_skip = self.sigma_data**2 / (sigma**2 + self.sigma_data**2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma**2 + self.sigma_data**2)
        c_in = 1.0 / jnp.sqrt(self.sigma_data**2 + sigma**2)
        c_noise = jnp.log(sigma) / 4.0

        f_x = UNet(
            img_resolution=tuple(self.img_resolution),
            in_channels=in_img.shape[-1],
            out_channels=self.out_channels,
            label_dim=self.label_dim,
            model_channels=self.model_channels,
            channel_mult=tuple(self.channel_mult),
            num_blocks=self.num_blocks,
            dropout=self.dropout,
            use_diffuse=self.use_diffuse,
            dtype=self.dtype,
            name="model",
        )(
            (c_in * in_img).astype(x.dtype),
            noise_labels=c_noise.reshape(-1),
            class_labels=class_labels,
            train=train,
        )
        return c_skip * x + c_out * f_x
