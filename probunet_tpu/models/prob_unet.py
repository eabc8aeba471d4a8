"""Probabilistic U-Net: U-Net backbone + variational latent space.

Re-design of ``ProbabilisticUNet`` (reference src/prob_unet.py:140-384) as a
pure-functional Flax module:

- the three ELBO variants the reference toggles by commenting code in and
  out (WMSE-MS-SSIM active at src/prob_unet.py:229-267; afCRPS at :273-317;
  L1 at :325-381) are ONE ``elbo`` method dispatching on ``loss_type`` —
  all jit-compatible;
- the M-sample reconstruction loop (reference src/prob_unet.py:246-252,
  M Python iterations of rsample+fcomb) becomes a single batched
  ``rsample(sample_shape=(M,))`` + :meth:`Fcomb.ensemble` decode with shared
  U-Net features — the MXU sees one big batched matmul instead of M small
  ones;
- beta weights are explicit ``elbo`` arguments instead of mutable module
  attributes (the reference mutates ``model.beta_1`` per epoch,
  src/main.py:122-123), so the annealing schedule stays outside the
  compiled step as a traced scalar;
- PRNG keys are threaded through flax's rng collections ('latent' for
  sampling, 'dropout' for the U-Net).

``elbo`` returns ``(total_loss, metrics_dict)`` — metrics carry the same
scalars the reference returns per-variant (recon, kl, wmse, msssim,
per-channel L1, kl2) under stable keys.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from probunet_tpu.models.fcomb import Fcomb
from probunet_tpu.models.gaussian import AxisAlignedConvGaussian
from probunet_tpu.models.unet import UNet
from probunet_tpu.ops.distributions import (
    kl_diag_gaussians,
    kl_to_standard_normal,
)
from probunet_tpu.ops.losses import (
    afcrps_loss,
    crps_loss,
    l1_loss,
    l1_loss_per_channel,
    wmse_ms_ssim_loss,
)

LOSS_TYPES = ("afcrps", "crps", "mse+ssim", "l1")


class ProbabilisticUNet(nn.Module):
    """Composition of UNet + prior/posterior Gaussians + Fcomb
    (reference src/prob_unet.py:140-189). Defaults follow src/main.py:35-45.
    """

    input_channels: int = 3
    num_classes: int = 3
    latent_dim: int = 32
    num_filters: Sequence[int] = (32, 64, 128, 256)
    model_channels: int = 32
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    img_resolution: Tuple[int, int] = (128, 128)
    num_blocks: int = 2
    dropout: float = 0.10
    dtype: Any = None
    # True = checkpoint every UNet block; a tuple of level indices
    # checkpoints only those resolution levels (see models.unet.UNet.remat)
    remat: Any = False

    def setup(self):
        self.unet = UNet(
            img_resolution=tuple(self.img_resolution),
            in_channels=self.input_channels,
            out_channels=self.num_filters[0],
            label_dim=1,
            model_channels=self.model_channels,
            channel_mult=tuple(self.channel_mult),
            num_blocks=self.num_blocks,
            dropout=self.dropout,
            use_diffuse=False,
            dtype=self.dtype,
            remat=self.remat,
        )
        # remat="save_convs_all" extends the save-conv-outputs checkpoint
        # policy (models/unet.py `remat`) to the Gaussian encoders: conv
        # outputs stay stored, the interleaved ReLU/pool chains are
        # recomputed in the backward pass. Class-level nn.remat keeps the
        # parameter tree identical (prior/posterior names unchanged).
        if self.remat == "save_convs_all":
            gauss_cls = nn.remat(
                AxisAlignedConvGaussian,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out"),
            )
        else:
            gauss_cls = AxisAlignedConvGaussian
        self.prior = gauss_cls(
            num_filters=tuple(self.num_filters),
            latent_dim=self.latent_dim,
            posterior=False,
            dtype=self.dtype,
        )
        self.posterior = gauss_cls(
            num_filters=tuple(self.num_filters),
            latent_dim=self.latent_dim,
            posterior=True,
            dtype=self.dtype,
        )
        # remat covers the UNet blocks only: checkpointing the fcomb decode
        # was measured to INCREASE peak HBM (prevent_cse duplication
        # outweighs the dropped (B, M, H, W, C) residuals on v5e)
        self.fcomb = Fcomb(
            unet_output_channels=self.num_filters[0],
            latent_dim=self.latent_dim,
            num_classes=self.num_classes,
            dtype=self.dtype,
        )

    # ------------------------------------------------------------------
    def __call__(self, x, target=None, t=None, training: bool = True):
        """Single-sample forward (reference src/prob_unet.py:194-224):
        z ~ posterior (training, with target) else prior; decode via fcomb."""
        feats = self.unet(x, train=training)
        if self.is_initializing():
            # touch both branches so init creates prior AND posterior params
            self.prior(x)
            self.posterior(x, target if target is not None else x)
        if training and target is not None:
            dist = self.posterior(x, target)
        else:
            dist = self.prior(x)
        z = dist.rsample(self.make_rng("latent"))
        return self.fcomb(feats, z)

    def sample(self, x, num_samples: int = 1, t=None):
        """Prior ensemble with shared U-Net features:
        (B, num_samples, H, W, num_classes). The efficient inference path the
        reference only uses in latent exploration
        (reference src/latent_exploration.py:119-144)."""
        feats = self.unet(x, train=False)
        dist = self.prior(x)
        zs = dist.rsample(self.make_rng("latent"), sample_shape=(num_samples,))
        return self.fcomb.ensemble(feats, zs)

    def encode(self, x, target=None):
        """(features, prior, posterior-or-None) — the latent-exploration API."""
        feats = self.unet(x, train=False)
        prior = self.prior(x)
        post = self.posterior(x, target) if target is not None else None
        return feats, prior, post

    def decode(self, feats, zs):
        """fcomb-only batched decode with frozen features
        (reference src/latent_exploration.py:119-144)."""
        if zs.ndim == 2:
            return self.fcomb(feats, zs)
        return self.fcomb.ensemble(feats, zs)

    # ------------------------------------------------------------------
    def elbo(
        self,
        x,
        target,
        t=None,
        M: int = 1,
        loss_type: str = "afcrps",
        beta_0: float = 1.0,
        beta_1: float = 0.0,
        beta_2: float = 0.0,
        alpha: float = 0.95,
        alpha_w: float = 0.007,
        beta_w: float = 0.048,
        lam_w: float = 0.0,
        training: bool = True,
    ):
        """ELBO = beta_0 * recon + beta_1 * KL(q||p) [+ beta_2 * KL(q||N(0,I))].

        Returns (total, metrics) with metrics = {"recon", "kl", "kl_mean", ...}.
        """
        if loss_type not in LOSS_TYPES:
            raise ValueError(f"unknown loss_type {loss_type!r}")

        feats = self.unet(x, train=training)
        prior = self.prior(x)
        posterior = self.posterior(x, target)
        kl = kl_diag_gaussians(posterior, prior)  # (B,)

        key = self.make_rng("latent")
        metrics = {}

        if loss_type in ("afcrps", "crps"):
            # reference afCRPS ELBO (src/prob_unet.py:273-317)
            if M < 2:
                raise ValueError(f"M must be >= 2 for {loss_type}, got {M}")
            zs = posterior.rsample(key, sample_shape=(M,))      # (M, B, D)
            from probunet_tpu.ops.pallas.fcomb_crps import (
                fused_elbo_enabled, fused_fcomb_crps_loss,
            )

            if fused_elbo_enabled():
                # fused fcomb-decode + CRPS kernel: never materializes the
                # (B, M, H, W, K) ensemble or the (M, B, H, W, C) hiddens
                # (ops/pallas/fcomb_crps.py; numerics-identical)
                fc = self.fcomb
                fc_params = {
                    "layer0_weight": fc.layer0_weight,
                    "layer0_bias": fc.layer0_bias,
                    "layer1_weight": fc.layer1_weight,
                    "layer1_bias": fc.layer1_bias,
                    "layer2_weight": fc.layer2_weight,
                    "layer2_bias": fc.layer2_bias,
                }
                recon = fused_fcomb_crps_loss(
                    feats, zs, fc_params, target, loss_type, alpha,
                    "bfloat16" if self.dtype == jnp.bfloat16 else "float32",
                )
            else:
                ensemble = self.fcomb.ensemble(feats, zs)       # (B, M, H, W, K)
                if loss_type == "afcrps":
                    recon = afcrps_loss(ensemble, target, alpha=alpha)
                else:
                    recon = crps_loss(ensemble, target)
            total = beta_0 * recon + beta_1 * kl.mean()
        elif loss_type == "mse+ssim":
            # reference WMSE-MS-SSIM ELBO (src/prob_unet.py:229-267): M draws,
            # each scored separately, losses averaged
            zs = posterior.rsample(key, sample_shape=(M,))
            ensemble = self.fcomb.ensemble(feats, zs)           # (B, M, H, W, K)
            per_draw = jax.vmap(
                lambda pred: wmse_ms_ssim_loss(
                    pred, target, alpha=alpha_w, beta=beta_w, lam=lam_w,
                    return_components=True,
                ),
                in_axes=1,
            )(ensemble)
            losses, wmses, msssims = per_draw
            recon = losses.mean()
            metrics["wmse"] = wmses[-1]     # reference logs last draw's values
            metrics["msssim"] = msssims[-1]
            total = beta_0 * recon + beta_1 * kl.mean()
        else:  # l1 — original ELBO (src/prob_unet.py:325-381): one draw
            z = posterior.rsample(key)
            pred = self.fcomb(feats, z)
            recon = l1_loss(pred, target)
            metrics["recon_per_channel"] = l1_loss_per_channel(pred, target)
            kl2 = kl_to_standard_normal(posterior)
            metrics["kl2_mean"] = kl2.mean()
            total = beta_0 * recon + beta_1 * kl.mean() + beta_2 * kl2.mean()

        metrics["recon"] = recon
        metrics["kl"] = kl
        metrics["kl_mean"] = kl.mean()
        return total, metrics
