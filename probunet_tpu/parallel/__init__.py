"""Device-mesh parallelism for probunet_tpu.

The reference is strictly single-device (reference src/prob_unet.py:10,
src/train_prob_unet_model.py:62; no torch.distributed anywhere — SURVEY.md
§2.5). This package is the TPU-native scaling story built on
``jax.sharding`` + ``jit``/``shard_map`` over a named :class:`Mesh`:

- :mod:`mesh` — mesh construction and sharding helpers ("data", "spatial");
- :mod:`data_parallel` — batch-sharded jitted train/eval steps (DP over ICI;
  XLA inserts the gradient all-reduce implied by replicated-param output
  shardings);
- :mod:`spatial` — spatial-domain parallelism: halo exchange via
  ``shard_map`` + ``lax.ppermute`` and full-ClimEx-domain tiled ensemble
  inference (the CP-equivalent for a convolutional model, SURVEY.md §5);
- :mod:`tensor_parallel` — channel-sharded convolution pair over a
  ("data", "model") mesh (the P2 capability demo: Megatron column/row
  parallelism, conv edition, with GSPMD-derived collectives);
- :mod:`member_parallel` — ensemble-member parallelism for the serve path:
  prior draws sharded M-over-"member" with U-Net features shared, so
  M-member generation is ~M/n per-chip work with zero decode collectives.
"""

from probunet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from probunet_tpu.parallel.data_parallel import (
    make_parallel_eval_step,
    make_parallel_train_step,
)
from probunet_tpu.parallel.spatial import (
    extract_tiles,
    halo_exchange,
    halo_conv2d,
    stitch_tiles,
    tiled_ensemble,
)
from probunet_tpu.parallel.multihost import (
    global_batch,
    initialize,
    process_local_indices,
    replicate_global,
)
from probunet_tpu.parallel.member_parallel import (
    make_member_mesh,
    make_parallel_sample_step,
)
from probunet_tpu.parallel.tensor_parallel import (
    channel_sharded_block,
    init_channel_sharded_params,
    make_channel_sharded_apply,
    make_dp_tp_mesh,
    shard_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "make_parallel_train_step",
    "make_parallel_eval_step",
    "make_member_mesh",
    "make_parallel_sample_step",
    "halo_exchange",
    "halo_conv2d",
    "extract_tiles",
    "stitch_tiles",
    "tiled_ensemble",
    "initialize",
    "global_batch",
    "process_local_indices",
    "replicate_global",
    "make_dp_tp_mesh",
    "init_channel_sharded_params",
    "shard_params",
    "channel_sharded_block",
    "make_channel_sharded_apply",
]
