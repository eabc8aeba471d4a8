"""probunet_tpu — TPU-native probabilistic U-Net climate downscaling framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``MaryamAlipourH/prob-unet-climate-downscaling`` (reference mounted read-only at
/root/reference), designed TPU-first:

- NHWC layouts, static shapes, everything under one ``jax.jit``;
- M-sample ELBO via ``vmap`` over latent draws sharing U-Net features
  (the reference loops M times in Python: reference src/prob_unet.py:246-252);
- data parallelism + spatial sharding via ``jax.sharding.Mesh`` + XLA
  collectives (the reference is single-GPU: reference src/prob_unet.py:10);
- Pallas kernels for the fused hot paths (fcomb latent-broadcast head).

Subpackages
-----------
- ``config``    typed dataclass config tree + named presets
- ``data``      ClimEx pipeline (NetCDF/packed ingest, 4 pipeline types,
                standardization, synthetic generator, device prefetch)
- ``models``    EDM-style U-Net backbone, axis-aligned Gaussian prior/posterior,
                Fcomb head, ProbabilisticUNet, deterministic/linear/BCSD baselines
- ``ops``       losses (afCRPS/CRPS/WMSE+MS-SSIM/L1), diagonal-Gaussian math,
                resampling, metrics (CRPS/MAE/PSD), GEV extremes, Pallas kernels
- ``parallel``  mesh construction, DP/spatial sharding rules
- ``train``     jitted train/eval steps, beta schedules, early stopping,
                Orbax checkpointing, metric logging
- ``evals``     vmapped ensemble inference, latent-space exploration,
                return-level analysis
"""

__version__ = "0.1.0"
