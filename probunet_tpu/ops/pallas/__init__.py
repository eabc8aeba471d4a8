"""Pallas TPU kernels for the hot ops.

The reference has no native kernels (100% Python/PyTorch — SURVEY.md §2);
its hot paths run through cuDNN/cuBLAS. The TPU-native equivalents here are
Mosaic/Pallas kernels for the two fusion opportunities XLA does not get by
itself:

- :func:`fcomb_fused` — the Fcomb decode head (broadcast z + 3-layer 1x1
  conv MLP) as ONE VMEM-resident pass per spatial tile, with the
  feature-side matmul computed once and reused across all M ensemble
  members (reference recomputes the whole U-Net per member on its sampling
  path, SURVEY.md §3.3);
- :func:`groupnorm_silu` — GroupNorm + SiLU fused, with group statistics
  computed as indicator-matrix matmuls (MXU-friendly, no lane-crossing
  reshapes) — the UNetBlock's normalization hot path
  (reference src/networks.py:97-107,159).

On non-TPU backends both kernels fall back to ``interpret=True``
(numerics-identical, used by the CPU test suite).
"""

from probunet_tpu.ops.pallas.fcomb import fcomb_fused
from probunet_tpu.ops.pallas.groupnorm import groupnorm_silu

__all__ = ["fcomb_fused", "groupnorm_silu"]
