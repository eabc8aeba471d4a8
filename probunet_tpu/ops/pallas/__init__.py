"""Pallas TPU kernels for the hot ops.

The reference has no native kernels (100% Python/PyTorch — SURVEY.md §2);
its hot paths run through cuDNN/cuBLAS. Kernels live here only when honest
device timing (scalar-host-read sync; see bench.py) shows they earn their
keep against XLA's own fusion:

- :func:`ensemble_crps_terms` — the afCRPS/CRPS ensemble-loss terms with an
  ANALYTIC backward. Ships as the TPU default in ops.losses: it ties XLA's
  best fused formulation in-step (270 vs 273 ms flagship train step) while
  guaranteeing the gradient never routes through a sort/scatter (the
  naively-differentiated sorted form costs 577 ms in backward alone).
- :func:`fused_fcomb_crps_loss` (fcomb_crps.py) — the M-member fcomb decode
  fused into the CRPS reduction; never materializes the (B,M,H,W,C)
  ensemble or its backward temps (484 -> 535 samples/s flagship).

Multi-chip: a bare pallas_call is an opaque custom call GSPMD cannot
partition. Both shipped kernels therefore run shard_map-wrapped over the
mesh registered by the parallel step builders (partition.py): batch over
the "data" axis, pixels over "spatial" with psum'd partial sums,
replicated fcomb weights (their gradient psum comes from shard_map's
transpose). Verified against the unsharded oracles on the 8-device CPU
mesh in tests/test_parallel.py and in ``dryrun_multichip``.

Retired with measurements (v5e honest timing):

- :func:`gn_film_silu_dropout` (fused_gn.py, round 3) — the whole UNetBlock
  inter-conv GN/FiLM/SiLU/dropout chain, lane-packed for C < 128, analytic
  backward, in-kernel stateless dropout PRNG. Correct (15 oracle tests) but
  SLOWER than XLA's own GN fusion at block scope: UNetBlock f+b 12.81 ms
  (kernel) vs 9.03 ms (XLA) at the dominant 128x128xC32 bs=128 shape
  (isolated chain f+b 7.62 vs 3.34 ms), and the flagship train step fails
  to compile — the decoder's 128x128 concat block needs 20.7 MB scoped
  VMEM vs the 16 MB limit (scripts/profile_block.py). Kept importable and
  tested as the measured record; opt-in via PROBUNET_GN_IMPL=pallas.

- fcomb decode kernel — XLA's fusion of the concat-free split-matmul
  formulation (models.fcomb) ran the bs=64 M=15 ensemble decode in 8.7 ms
  bf16 vs the kernel's 32.7 ms, and the kernel's recompute-based backward
  exceeded HBM at bs=128. Removed.
- GroupNorm+SiLU kernel — 2.0 ms/op vs XLA's 0.5 ms at its best-case
  64x64xC32 shape; could not compile at the flagship 128x128 shape (32M
  scoped-VMEM stack vs the 16M limit). Removed; the op's real win was
  running the normalize pass in bf16 (models.layers.EDMGroupNorm dtype).

On non-TPU backends the kernels run in interpret mode (numerics-identical;
used by the CPU test suite).
"""

from probunet_tpu.ops.pallas.afcrps import (
    ensemble_crps_terms,
    ensemble_crps_terms_partitioned,
)
from probunet_tpu.ops.pallas.fused_gn import gn_film_silu_dropout
from probunet_tpu.ops.pallas.partition import (
    clear_kernel_mesh,
    kernel_mesh_is_active,
    set_kernel_mesh,
)

__all__ = [
    "ensemble_crps_terms",
    "ensemble_crps_terms_partitioned",
    "gn_film_silu_dropout",
    "set_kernel_mesh",
    "clear_kernel_mesh",
    "kernel_mesh_is_active",
]
