"""EDM-style primitive layers in Flax (NHWC, TPU-native).

Functional re-design of the primitives the reference's U-Net is built from
(reference src/networks.py:21-218, duplicated at
src/baseline/deterministic_unet.py:21-222):

- the four EDM ``weight_init`` modes with explicit fan-in/out and separate
  weight/bias scales (reference src/networks.py:21-26), including the EDM
  quirk that conv *biases* are initialized with the conv weight's fan-in;
- ``EDMConv`` with optional 2x resampling. The reference implements
  resampling as grouped (transposed) convs with the [1,1] separable filter
  (src/networks.py:68-92); for that filter those are mathematically exactly
  nearest-neighbor 2x upsampling / 2x2 mean pooling, which is what we emit —
  XLA lowers these to cheap reshapes/reductions instead of grouped convs
  (grouped convs map poorly onto the MXU);
- ``EDMGroupNorm`` with the adaptive group count min(32, C // 4)
  (src/networks.py:97-107);
- ``UNetBlock``: GN -> SiLU -> conv(up/down) -> FiLM from embedding ->
  dropout -> zero-init conv -> skip, with optional self-attention
  (src/networks.py:134-187). Attention runs in fp32 like the reference's
  ``AttentionOp`` (src/networks.py:114-127) — JAX autodiff provides the
  custom backward for free.

Compute dtype: pass ``dtype=jnp.bfloat16`` to run convs/matmuls in bf16 on
the MXU with fp32 accumulation (``preferred_element_type``); parameters are
always stored fp32.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax
from jax.ad_checkpoint import checkpoint_name

from probunet_tpu.ops.resample import avg_pool, upsample_nearest

# (init_mode, init_weight_scale, init_bias_scale) triples, mirroring the two
# dicts built in reference src/networks.py:246-247:
INIT_DEFAULT = ("kaiming_normal", 1.0, 0.0)
INIT_EDM = ("kaiming_uniform", math.sqrt(1.0 / 3.0), math.sqrt(1.0 / 3.0))
INIT_ZERO = ("kaiming_uniform", 0.0, 0.0)


def _dropout(rng, y, drop_p: float):
    """Inverted dropout. Default: ``jax.random.bernoulli`` (u32 bits).

    The mask's u32 random bits are the step's one non-parity-constrained
    byte sink (19.2 GB of 122.4 GB, BENCH_DROPOUT=0 A/B — see DESIGN.md
    "HBM roofline"). The obvious fix — draw u32 at half shape, bitcast
    to u16, threshold at round(p*65536) — is implemented below as
    PROBUNET_DROPOUT_BITS=16 but RETIRED as a default on measurement:
    624 samples/s and 126.8 GB/step vs bernoulli's 639 / 122.4 — the
    bitcast+reshape forces a layout materialization that costs more
    than the halved generation saves. (Trace-time capture, like
    PROBUNET_CRPS_IMPL.) The real fix is in-kernel PRNG regenerated in
    the backward pass: PROBUNET_DROPOUT_IMPL=pallas routes through
    ops/pallas/dropout.py — zero mask bytes in HBM, mask recomputed
    in-register in both directions."""
    import os

    if os.environ.get("PROBUNET_DROPOUT_IMPL") == "pallas":
        from probunet_tpu.ops.pallas import dropout as pl_dropout

        if pl_dropout.supported(y.shape):
            kd = jax.random.key_data(rng).ravel()
            seed2 = kd[:2].astype(jnp.int32)
            return pl_dropout.dropout(y, seed2, float(drop_p))

    c = y.shape[-1]
    bits_mode = os.environ.get("PROBUNET_DROPOUT_BITS", "32")
    if bits_mode == "u32":
        # Compare the raw u32 bits directly — same element count/width as
        # bernoulli's draw but no u32->f32 _uniform conversion, whose output
        # the scheduler layout-copies at full activation shape (fusion
        # table: 7x ~537 MB `copy ... jit(_bernoulli)/jit(_uniform)` +
        # 3.6 GB rng-bit-generator). keep ~ Bernoulli(1-p) exactly: bits is
        # uniform on [0, 2^32), so P(bits >= round(p*2^32)) = 1-p up to
        # 2^-32 quantization (clamped like the u16 path below).
        # RETIRED as a default on measurement (r4 queue 2): 630.2
        # samples/s / 126.1 GB/step vs bernoulli's 639.3 / 122.4 — the
        # integer-compare plumbing costs +3.7 GB of layout traffic, the
        # same failure mode as the u16 and Pallas variants. The _uniform
        # copies the fusion table itemizes are already the cheapest
        # scheduling XLA found for this chain.
        raw = jax.random.bits(rng, y.shape, jnp.uint32)
        thresh = min(max(round(drop_p * 4294967296.0), 1), 4294967295)
        keep = raw >= jnp.uint32(thresh)
    elif c % 2 == 0 and bits_mode == "16":
        raw = jax.random.bits(rng, y.shape[:-1] + (c // 2,), jnp.uint32)
        bits = lax.bitcast_convert_type(raw, jnp.uint16).reshape(y.shape)
        # Clamp to [1, 65535]: round(p*65536) is 0 for p < ~7.6e-6 (dropout
        # would silently no-op, unlike bernoulli) and 65536 wraps uint16 to
        # 0 at p=1.0 (would KEEP everything instead of dropping all).
        thresh = min(max(round(drop_p * 65536.0), 1), 65535)
        keep = bits >= jnp.uint16(thresh)
    else:
        keep = jax.random.bernoulli(rng, 1.0 - drop_p, y.shape)
    return jnp.where(keep, y / (1.0 - drop_p), 0).astype(y.dtype)


def edm_init(mode: str, fan_in: int, fan_out: int, scale: float):
    """Initializer implementing reference src/networks.py:21-26 semantics."""

    def init(key, shape, dtype=jnp.float32):
        if scale == 0.0:
            return jnp.zeros(shape, dtype)
        if mode == "xavier_uniform":
            w = math.sqrt(6 / (fan_in + fan_out)) * (
                jax.random.uniform(key, shape, dtype) * 2 - 1
            )
        elif mode == "xavier_normal":
            w = math.sqrt(2 / (fan_in + fan_out)) * jax.random.normal(key, shape, dtype)
        elif mode == "kaiming_uniform":
            w = math.sqrt(3 / fan_in) * (jax.random.uniform(key, shape, dtype) * 2 - 1)
        elif mode == "kaiming_normal":
            w = math.sqrt(1 / fan_in) * jax.random.normal(key, shape, dtype)
        else:
            raise ValueError(f'Invalid init mode "{mode}"')
        return w * scale

    return init


class EDMLinear(nn.Module):
    """Fully-connected layer with EDM init (reference src/networks.py:31-44)."""

    features: int
    use_bias: bool = True
    init: Tuple[str, float, float] = INIT_DEFAULT
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        mode, w_scale, b_scale = self.init
        w = self.param(
            "weight", edm_init(mode, fan_in, self.features, w_scale),
            (fan_in, self.features),
        )
        dt = self.dtype or x.dtype
        y = jnp.dot(x.astype(dt), w.astype(dt), preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param(
                "bias", edm_init(mode, fan_in, self.features, b_scale), (self.features,)
            )
            y = y + b
        return y.astype(x.dtype)


class EDMConv(nn.Module):
    """3x3 / 1x1 conv with optional fixed 2x up/down resampling.

    kernel=0 means "resample only" (the channel-preserving skip path,
    reference src/networks.py:158-159). With the reference's default
    resample_filter=[1,1], its grouped-conv resampling equals nearest 2x
    upsampling (up) / 2x2 average pooling (down), applied BEFORE the learned
    conv (the unfused branch actually taken, src/networks.py:83-89).
    """

    features: int
    kernel: int = 3
    use_bias: bool = True
    up: bool = False
    down: bool = False
    init: Tuple[str, float, float] = INIT_DEFAULT
    dtype: Any = None

    @nn.compact
    def __call__(self, x, x2=None):
        """``x2``: optional second input, treated as channel-concatenated
        after ``x`` WITHOUT materializing the concat — convolution is linear
        in its input channels, so conv([x;x2], W) = conv(x, W[..., :c1, :])
        + conv(x2, W[..., c1:, :]) with the identical (k,k,c1+c2,features)
        parameter. Used by the decoder's skip-concat blocks (UNetBlock
        ``skip_in``) to keep the 2C skip tensor out of HBM."""
        assert not (self.up and self.down)
        if x2 is not None:
            assert self.kernel and not (self.up or self.down)
        if self.up:
            x = upsample_nearest(x, 2)
        if self.down:
            x = avg_pool(x, 2)
        if not self.kernel:
            return x

        cin = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
        k = self.kernel
        fan_in = cin * k * k
        fan_out = self.features * k * k
        mode, w_scale, b_scale = self.init
        w = self.param(
            "weight", edm_init(mode, fan_in, fan_out, w_scale), (k, k, cin, self.features)
        )
        dt = self.dtype or x.dtype
        pad = k // 2

        # int8 serving path (ops/quantize.py): calibration sows input
        # absmax into "quant_stats"; serving with a "quant" collection of
        # per-conv input scales runs the conv int8 x int8 -> int32 on the
        # MXU's 2x int8 path. No effect when neither collection is present.
        from probunet_tpu.ops import quantize as _qz

        _qz.sow_absmax(self, x)
        if x2 is not None:
            _qz.sow_absmax(self, x2, "absmax2")
        # Fall back to the float conv unless EVERY scale this call needs is
        # present: a quant tree calibrated on a path that never exercised
        # the skip-concat (x2) input would otherwise fail at serve time
        # with an opaque missing-variable error.
        if self.has_variable("quant", "in_scale") and (
                x2 is None or self.has_variable("quant", "in_scale2")):
            c1 = x.shape[-1]
            y = _qz.int8_conv(x, w[:, :, :c1, :],
                              self.get_variable("quant", "in_scale"), pad)
            if x2 is not None:
                y = y + _qz.int8_conv(x2, w[:, :, c1:, :],
                                      self.get_variable("quant", "in_scale2"),
                                      pad)
            if self.use_bias:
                b = self.param(
                    "bias", edm_init(mode, fan_in, fan_out, b_scale),
                    (self.features,))
                y = y + b
            return checkpoint_name(y.astype(x.dtype), "conv_out")

        # PROBUNET_ACT_COMPRESS=int8 (trace-time): the custom-vjp conv that
        # stores its input as per-channel int8 for backward — exact fwd and
        # dx, int8-roundtripped input only in dW (ops/act_compress.py, the
        # VERDICT-r4-#4 probe). Off by default; measured in DESIGN.md.
        from probunet_tpu.ops import act_compress as _ac

        if _ac.enabled():
            def conv(inp, kern):
                return _ac.act8_conv(inp, kern, pad, dt)
        else:
            def conv(inp, kern):
                return lax.conv_general_dilated(
                    inp.astype(dt),
                    kern.astype(dt),
                    window_strides=(1, 1),
                    padding=((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    # f32 accumulation only when computing in f32: with bf16
                    # operands the MXU accumulates in f32 internally, and
                    # requesting an f32 output breaks the conv transpose rule
                    # (f32 cotangent vs bf16 primal dtype mismatch in the vjp)
                    preferred_element_type=(dt if dt != jnp.float32
                                            else jnp.float32),
                )

        if x2 is None:
            y = conv(x, w)
        else:
            c1 = x.shape[-1]
            y = conv(x, w[:, :, :c1, :]) + conv(x2, w[:, :, c1:, :])
        if self.use_bias:
            b = self.param(
                "bias", edm_init(mode, fan_in, fan_out, b_scale), (self.features,)
            )
            y = y + b
        # Named for the "save_convs" remat policy (models/unet.py): under
        # nn.remat(policy=save_only_these_names("conv_out")) conv outputs are
        # the ONLY stored block residuals; the GN/FiLM/SiLU/dropout chains
        # between convs are recomputed in the backward pass instead of being
        # saved (a pure byte trade on an HBM-bound step — see DESIGN.md).
        # A no-op when not under a checkpoint.
        return checkpoint_name(y.astype(x.dtype), "conv_out")


def _gn_impl() -> str:
    """Which implementation computes GN chains: "xla" (the default on every
    backend) or "pallas" (the fused kernel, opt-in via PROBUNET_GN_IMPL).

    The fused chain kernel (ops/pallas/fused_gn.py) was RETIRED as a default
    with round-3 v5e measurements (scripts/profile_block.py, bs=128 bf16):
    at 128x128xC32 — the dominant level — the full UNetBlock f+b ran
    12.81 ms under the kernel vs 9.03 ms under XLA (isolated chain f+b
    7.62 vs 3.34 ms), and the flagship train step does not compile at all:
    the decoder's 128x128 concat block (C=64 -> k*C=128, 8192 rows) needs
    20.7 MB of scoped VMEM against the 16 MB limit. XLA's own GN fusion
    wins outright on this op family, like the round-1 GN+SiLU kernel
    (2.0 vs 0.5 ms). The kernel stays importable and tested (interpret
    mode) as the measured record.

    Value captured at TRACE time (jit caches keep the first-traced impl).
    """
    import os

    return os.environ.get("PROBUNET_GN_IMPL", "xla")


class _GNScaleBias(nn.Module):
    """GN affine params with nn.GroupNorm-identical tree (gn/{scale,bias})."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return scale, bias


class EDMGroupNorm(nn.Module):
    """GroupNorm with adaptive group count (reference src/networks.py:97-107).

    ``__call__(x, silu=True, film=(scale, shift), drop_p=p, drop_rng=key)``
    evaluates the whole UNetBlock inter-conv chain

        dropout(silu((gn(x)*gamma + beta) * (scale+1) + shift))

    through one XLA fusion by default, or through the fused Pallas kernel
    (ops/pallas/fused_gn.py) with PROBUNET_GN_IMPL=pallas. Both paths share
    an identical parameter tree (gn/{scale,bias}), so checkpoints are
    interchangeable.

    Two generations of hand-written GN kernels now LOST to XLA's own GN
    fusion and are retired as defaults, each with data: round 1's GN+SiLU
    kernel (2.0 vs 0.5 ms at 64x64xC32, VMEM blow-up at 128x128) and
    round 3's lane-packed whole-chain kernel with analytic backward
    (block f+b 12.81 vs 9.03 ms at the dominant 128x128xC32 level;
    scoped-VMEM OOM on the flagship decoder concat block — see
    ``_gn_impl``). The one-HBM-pass-per-direction argument underestimated
    XLA: its GN fusion chains the reduce into the preceding conv's
    epilogue and recomputes cheap elementwise in the backward, so the
    measured traffic gap never materialized.

    ``dtype`` sets the XLA path's normalize compute dtype; statistics are
    f32 in both paths.
    """

    num_groups: int = 32
    min_channels_per_group: int = 4
    eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, silu: bool = False, film=None, drop_p: float = 0.0,
                 drop_rng=None):
        c = x.shape[-1]
        groups = min(self.num_groups, c // self.min_channels_per_group)

        if _gn_impl() == "pallas" and x.ndim == 4:
            from probunet_tpu.ops.pallas import fused_gn

            if fused_gn.supported(x.shape[1], x.shape[2], c, groups):
                gamma, beta = _GNScaleBias(features=c, name="gn")()
                bsz = x.shape[0]
                if film is None:
                    scale = jnp.zeros((bsz, c), jnp.float32)
                    shift = scale
                else:
                    scale, shift = film
                if drop_p > 0.0:
                    kd = jax.random.key_data(drop_rng).ravel()
                    seed2 = kd[:2].astype(jnp.int32)
                else:
                    seed2 = jnp.zeros((2,), jnp.int32)
                return fused_gn.gn_film_silu_dropout(
                    x, gamma, beta, scale, shift, seed2,
                    groups, self.eps, float(drop_p), bool(silu))

        y = nn.GroupNorm(num_groups=groups, epsilon=self.eps,
                         dtype=self.dtype, name="gn")(x)
        if film is not None:
            scale, shift = film
            y = shift[:, None, None, :] + y * (scale[:, None, None, :] + 1)
        y = nn.silu(y) if silu else y
        if drop_p > 0.0:
            y = _dropout(drop_rng, y, drop_p)
        return y


class PositionalEmbedding(nn.Module):
    """DDPM++/ADM timestep embedding (reference src/networks.py:192-205)."""

    num_channels: int
    max_positions: int = 10000
    endpoint: bool = False

    def __call__(self, x):
        half = self.num_channels // 2
        freqs = jnp.arange(half, dtype=jnp.float32)
        freqs = freqs / (half - (1 if self.endpoint else 0))
        freqs = (1.0 / self.max_positions) ** freqs
        args = jnp.outer(x.astype(jnp.float32), freqs)
        return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)


class FourierEmbedding(nn.Module):
    """NCSN++ Fourier embedding (reference src/networks.py:210-218)."""

    num_channels: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, x):
        freqs = self.param(
            "freqs",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.num_channels // 2,),
        )
        args = jnp.outer(x.astype(jnp.float32), 2 * jnp.pi * freqs)
        return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)


class UNetBlock(nn.Module):
    """Unified residual U-Net block (reference src/networks.py:134-187).

    FiLM note: in the reference's current stack the embedding input is a
    constant zero vector (src/networks.py:310-316), so the `affine` layer
    contributes only its learned bias as per-channel (scale, shift). The
    full embedding path is kept here — XLA constant-folds the zero input.
    """

    out_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    num_heads: Optional[int] = None
    channels_per_head: int = 64
    dropout: float = 0.0
    skip_scale: float = 1.0
    eps: float = 1e-5
    adaptive_scale: bool = True
    init: Tuple[str, float, float] = INIT_EDM
    init_zero: Tuple[str, float, float] = INIT_ZERO
    init_attn: Optional[Tuple[str, float, float]] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, emb, train: bool = False, skip_in=None):
        """``skip_in``: optional U-Net skip tensor, channel-concatenated
        after ``x`` (the decoder's `cat([x, skip])` positions, reference
        src/networks.py:289-291). Passing it separately instead of
        pre-concatenating lets the 1x1 residual-path conv run as two
        sliced convs (EDMConv ``x2``) so the raw 2C concat's only
        remaining consumer is the norm0 fusion chain — XLA fuses the
        concatenate into the GN reduce/apply and never writes it to HBM.
        Numerically identical to calling with the concatenated tensor
        (same parameter tree; equivalence under test)."""
        x_in = x
        if skip_in is not None:
            full = jnp.concatenate([x, skip_in.astype(x.dtype)], axis=-1)
        else:
            full = x
        in_channels = full.shape[-1]
        out = self.out_channels
        heads = (
            0
            if not self.attention
            else (
                self.num_heads
                if self.num_heads is not None
                else out // self.channels_per_head
            )
        )

        h = EDMGroupNorm(eps=self.eps, name="norm0",
                         dtype=self.dtype)(full, silu=True)
        x = EDMConv(
            out, 3, up=self.up, down=self.down, init=self.init, dtype=self.dtype,
            name="conv0",
        )(h)

        params = EDMLinear(
            out * (2 if self.adaptive_scale else 1), init=self.init,
            dtype=self.dtype, name="affine",
        )(emb)
        # FiLM + SiLU + dropout evaluated by EDMGroupNorm as ONE chain
        # (XLA composition by default; PROBUNET_GN_IMPL=pallas opts into the
        # retired fused kernel — see _gn_impl for the measurements)
        drop_p = self.dropout if train else 0.0
        drop_rng = self.make_rng("dropout") if drop_p > 0.0 else None
        if self.adaptive_scale:
            scale, shift = jnp.split(params, 2, axis=-1)  # (B, C) each
            x = EDMGroupNorm(eps=self.eps, name="norm1", dtype=self.dtype)(
                x, silu=True, film=(scale, shift), drop_p=drop_p,
                drop_rng=drop_rng)
        else:
            x = EDMGroupNorm(eps=self.eps, name="norm1", dtype=self.dtype)(
                x + params[:, None, None, :], silu=True, drop_p=drop_p,
                drop_rng=drop_rng)
        x = EDMConv(out, 3, init=self.init_zero, dtype=self.dtype, name="conv1")(x)

        if out != in_channels or self.up or self.down:
            kernel = 1 if out != in_channels else 0
            conv_skip = EDMConv(
                out, kernel, up=self.up, down=self.down, init=self.init,
                dtype=self.dtype, name="skip",
            )
            if skip_in is not None:
                # out != in always holds at concat positions, so kernel == 1
                # and the split (two sliced 1x1 convs) applies
                skip = conv_skip(x_in, skip_in.astype(x_in.dtype))
            else:
                skip = conv_skip(full)
        else:
            skip = full
        x = (x + skip) * self.skip_scale

        if heads:
            b, h, w, c = x.shape
            y = EDMGroupNorm(eps=self.eps, name="norm2", dtype=self.dtype)(x)
            qkv = EDMConv(
                c * 3, 1,
                init=(self.init_attn if self.init_attn is not None else self.init),
                dtype=self.dtype, name="qkv",
            )(y)
            # (B, H, W, 3C) -> (B*heads, ch, 3, HW) split like the reference
            ch = c // heads
            qkv = qkv.reshape(b, h * w, heads, 3 * ch).transpose(0, 2, 3, 1)
            qkv = qkv.reshape(b * heads, 3, ch, h * w)
            q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # (B*heads, ch, HW)
            # fp32 softmax(Q^T K / sqrt(ch)) as in reference AttentionOp
            logits = jnp.einsum(
                "ncq,nck->nqk",
                q.astype(jnp.float32),
                k.astype(jnp.float32) / math.sqrt(ch),
            )
            wgt = jax.nn.softmax(logits, axis=2).astype(x.dtype)
            a = jnp.einsum("nqk,nck->ncq", wgt, v)
            a = a.reshape(b, heads, ch, h * w).transpose(0, 3, 1, 2).reshape(b, h, w, c)
            x = x + EDMConv(c, 1, init=self.init_zero, dtype=self.dtype, name="proj")(a)
            x = x * self.skip_scale
        return x
