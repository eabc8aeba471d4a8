"""Tensor (model) parallelism: channel-sharded convolutions.

SURVEY.md §2.5 P2: the reference has no model parallelism of any kind
(single GPU, reference src/prob_unet.py:10); this module is the TPU-native
capability demo — the Megatron two-matmul pattern mapped onto a pair of
convolutions over a ("data", "model") mesh:

  conv1: weights (kh, kw, Cin, Cmid) sharded on Cmid over "model"
         -> activations (B, H, W, Cmid) come out channel-sharded, NO
         communication (each device computes its slice of the output
         channels from the replicated input);
  conv2: weights (kh, kw, Cmid, Cout) sharded on Cmid over "model"
         -> the contraction over the sharded Cmid makes XLA insert ONE
         all-reduce (psum over "model") for the partial sums.

Everything is expressed as sharding annotations on a plain jit — GSPMD
derives the collectives; there is no hand-written communication. The same
annotations compose with the "data" axis (batch-sharded inputs), giving
DP x TP on one mesh. Useful at large `model_channels` where one chip's HBM
or MXU would otherwise bound the layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_dp_tp_mesh(n_model: int, n_data: int | None = None,
                    devices=None) -> Mesh:
    """A ("data", "model") mesh; remaining devices go to the data axis."""
    import numpy as np
    from jax.experimental import mesh_utils

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        if n % n_model:
            raise ValueError(f"{n} devices not divisible by n_model={n_model}")
        n_data = n // n_model
    devices = devices[: n_data * n_model]
    try:
        dev_array = mesh_utils.create_device_mesh((n_data, n_model),
                                                  devices=devices)
    except (ValueError, AssertionError):
        dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def init_channel_sharded_params(key, c_in: int, c_mid: int, c_out: int,
                                kernel: int = 3):
    """Two conv kernels (HWIO) for the sharded pair; fan-in scaled init."""
    k1, k2 = jax.random.split(key)
    w1 = jax.random.normal(k1, (kernel, kernel, c_in, c_mid), jnp.float32)
    w1 = w1 / jnp.sqrt(kernel * kernel * c_in)
    w2 = jax.random.normal(k2, (kernel, kernel, c_mid, c_out), jnp.float32)
    w2 = w2 / jnp.sqrt(kernel * kernel * c_mid)
    return {"w1": w1, "w2": w2}


def param_shardings(mesh: Mesh) -> dict:
    """Cmid sharded over "model" in both kernels (Megatron column- then
    row-parallel, conv edition)."""
    return {
        "w1": NamedSharding(mesh, P(None, None, None, MODEL_AXIS)),
        "w2": NamedSharding(mesh, P(None, None, MODEL_AXIS, None)),
    }


def shard_params(params: dict, mesh: Mesh) -> dict:
    sh = param_shardings(mesh)
    return {k: jax.device_put(v, sh[k]) for k, v in params.items()}


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def channel_sharded_block(params: dict, x: jax.Array) -> jax.Array:
    """relu(conv1) -> conv2. Pure function; sharding comes entirely from the
    operand placements (jit propagates them, GSPMD inserts the psum)."""
    h = jax.nn.relu(_conv(x, params["w1"]))
    return _conv(h, params["w2"])


def make_channel_sharded_apply(mesh: Mesh):
    """Jitted TP conv block: batch over "data", Cmid over "model".

    Returns apply(params, x) expecting params from :func:`shard_params` and
    x placed with batch sharding (replicated also works — GSPMD
    resolves placements from the annotations).
    """
    x_sh = NamedSharding(mesh, P(DATA_AXIS))
    out_sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        channel_sharded_block,
        in_shardings=(param_shardings(mesh), x_sh),
        out_shardings=out_sh,
    )
