"""ADM/DDPM++ U-Net backbone and asymmetric post-U-Net variants (Flax, NHWC).

Re-design of the reference's three U-Net architectures:

- :class:`UNet` — the symmetric encoder/decoder ADM reimplementation
  (reference src/networks.py:226-333 and the use_diffuse embedding path of
  src/baseline/deterministic_unet.py:224-331, unified into ONE consistent
  module — the reference's two copies have diverged forward signatures,
  see SURVEY.md §1).
- :class:`PostUNetWithSkips` / :class:`PostUNetWithoutSkips` — asymmetric
  LR->HR variants that run a core U-Net at LR resolution then log2(ds_scale)
  upsampling stages (reference src/networks.py:337-412).
- :class:`UNetAll` — dispatcher on unet type (reference src/networks.py:416-432).

TPU design notes:
- the decoder's runtime channel-comparison concat trigger
  (reference src/networks.py:328, `if x.shape[1] != block.in_channels`)
  is resolved STATICALLY at trace time: exactly the `_block{i}` decoder
  positions concatenate a skip (the `_in0/_in1/_up` positions never do) —
  same dataflow, no dynamic shapes;
- skips are plain Python lists at trace time, so XLA sees one flat graph;
- the whole forward is jit/vmap/pjit friendly (no Python-level data
  dependence).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from probunet_tpu.models.layers import (
    EDMConv,
    INIT_DEFAULT,
    EDMGroupNorm,
    EDMLinear,
    INIT_EDM,
    INIT_ZERO,
    PositionalEmbedding,
    UNetBlock,
)
from probunet_tpu.ops.resample import upsample_nearest


class UNet(nn.Module):
    """Symmetric ADM U-Net (reference src/networks.py:226-333).

    Defaults mirror the reference signature. ``label_dim=1`` reproduces the
    current stack's constant-zero label embedding (src/networks.py:310-316):
    when no ``class_labels`` are passed, a zero dummy flows through
    ``map_label`` — so the embedding is exactly zero and each block's FiLM
    affine contributes only its learned bias.
    """

    img_resolution: Tuple[int, int]
    in_channels: int
    out_channels: int
    label_dim: int = 1
    augment_dim: int = 0
    model_channels: int = 16
    channel_mult: Sequence[int] = (1, 4, 8, 16)
    channel_mult_emb: int = 4
    num_blocks: int = 2
    attn_resolutions: Sequence[int] = (32, 16, 8)
    dropout: float = 0.10
    label_dropout: float = 0.0
    use_diffuse: bool = False
    dtype: Any = None
    # gradient rematerialization: True checkpoints EVERY residual block
    # (~1 extra forward pass for O(depth) less activation memory); a
    # sequence of level indices (e.g. (0,) or (0, 1)) checkpoints only the
    # blocks at those resolution levels — the shallow levels hold the
    # largest activations (L0 is 4x L1's bytes per tensor), so selective
    # remat buys most of the memory at a fraction of the recompute.
    # "save_convs" checkpoints every block under the
    # save_only_these_names("conv_out") policy: conv outputs stay stored
    # (convs are NEVER recomputed — full-block remat loses because it
    # replays them, DESIGN.md batch/remat ladder) while the elementwise
    # GroupNorm/FiLM/SiLU/dropout chains between convs are recomputed in
    # the backward pass — including the dropout masks, regenerated from
    # the identical fold_in keys instead of stored (the step's one
    # non-parity byte sink, 19.2 GB/step measured). Numerics identical.
    remat: Any = False

    @nn.compact
    def __call__(
        self,
        x,
        noise_labels=None,
        class_labels=None,
        augment_labels=None,
        train: bool = False,
        return_skips: bool = False,
    ):
        mc = self.model_channels
        emb_channels = mc * self.channel_mult_emb
        block_kwargs = dict(
            dropout=self.dropout, init=INIT_EDM, init_zero=INIT_ZERO,
            dtype=self.dtype,
        )
        # nn.remat checkpoints a block; `train` must stay static (the
        # transformed call sees (module, x, emb, train) -> index 3)
        _RematBlock = nn.remat(UNetBlock, static_argnums=(3,))
        _SaveConvsBlock = nn.remat(
            UNetBlock, static_argnums=(3,),
            policy=jax.checkpoint_policies.save_only_these_names("conv_out"),
        )

        def _block_cls(level: int):
            if self.remat in ("save_convs", "save_convs_all"):
                return _SaveConvsBlock
            if self.remat is True:
                return _RematBlock
            if not self.remat:  # False / None / empty sequence
                return UNetBlock
            return _RematBlock if level in tuple(self.remat) else UNetBlock
        b = x.shape[0]
        # Residual stream in the COMPUTE dtype: with dtype=bf16 every conv
        # output is already bf16-rounded (preferred_element_type, see
        # layers.EDMConv) — storing it f32 doubles activation HBM traffic
        # for zero extra information. Cast once here, back at the output.
        out_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)

        # ---- Mapping (reference src/networks.py:310-317 and
        #      src/baseline/deterministic_unet.py:300-317) ----
        emb = jnp.zeros((b, emb_channels), dtype=x.dtype)
        if self.label_dim:
            labels = (
                class_labels
                if class_labels is not None
                else jnp.zeros((b, self.label_dim), dtype=x.dtype)
            )
            if train and self.label_dropout:
                # drawn from the "dropout" collection every training caller
                # already supplies (flax folds a unique path salt per
                # make_rng call, so this never collides with nn.Dropout)
                keep = (
                    jax.random.uniform(
                        self.make_rng("dropout"), (b, 1), dtype=labels.dtype
                    )
                    >= self.label_dropout
                )
                labels = labels * keep.astype(labels.dtype)
            emb = emb + EDMLinear(
                emb_channels,
                use_bias=False,
                init=("kaiming_normal", math.sqrt(self.label_dim), 0.0),
                name="map_label",
            )(labels)
        if self.use_diffuse:
            nl = (
                noise_labels
                if noise_labels is not None
                else jnp.zeros((b,), dtype=x.dtype)
            )
            emb_n = PositionalEmbedding(num_channels=mc, name="map_noise")(nl)
            emb_n = nn.silu(EDMLinear(emb_channels, init=INIT_EDM, name="map_layer0")(emb_n))
            emb_n = EDMLinear(emb_channels, init=INIT_EDM, name="map_layer1")(emb_n)
            emb = emb + emb_n
        if self.augment_dim and augment_labels is not None:
            emb = emb + EDMLinear(
                mc, use_bias=False, init=INIT_ZERO, name="map_augment"
            )(augment_labels)
        emb = nn.silu(emb)

        # ---- Encoder (reference src/networks.py:260-276) ----
        skips = []
        cout = self.in_channels
        for level, mult in enumerate(self.channel_mult):
            Block = _block_cls(level)
            resx = self.img_resolution[0] >> level
            resy = self.img_resolution[1] >> level
            if level == 0:
                cout = mc * mult
                x = EDMConv(
                    cout, 3, init=INIT_EDM, dtype=self.dtype,
                    name=f"enc_{resx}x{resy}_conv",
                )(x)
            else:
                x = Block(
                    out_channels=cout, down=True, name=f"enc_{resx}x{resy}_down",
                    **block_kwargs,
                )(x, emb, train)
            skips.append(x)
            for idx in range(self.num_blocks):
                cout = mc * mult
                x = Block(
                    out_channels=cout, attention=False,
                    name=f"enc_{resx}x{resy}_block{idx}", **block_kwargs,
                )(x, emb, train)
                skips.append(x)
        skips_postunet = skips[:3]  # reference src/networks.py:324

        # ---- Decoder (reference src/networks.py:280-297) ----
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            Block = _block_cls(level)
            resx = self.img_resolution[0] >> level
            resy = self.img_resolution[1] >> level
            if level == len(self.channel_mult) - 1:
                x = Block(
                    out_channels=cout, attention=False,
                    name=f"dec_{resx}x{resy}_in0", **block_kwargs,
                )(x, emb, train)
                x = Block(
                    out_channels=cout, name=f"dec_{resx}x{resy}_in1", **block_kwargs
                )(x, emb, train)
            else:
                x = Block(
                    out_channels=cout, up=True, name=f"dec_{resx}x{resy}_up",
                    **block_kwargs,
                )(x, emb, train)
            for idx in range(self.num_blocks + 1):
                # static resolution of the reference's runtime concat check;
                # the skip rides in as UNetBlock's skip_in so the 2C concat
                # never materializes in HBM (split 1x1 residual conv —
                # layers.py UNetBlock docstring)
                cout = mc * mult
                x = Block(
                    out_channels=cout, attention=False,
                    name=f"dec_{resx}x{resy}_block{idx}", **block_kwargs,
                )(x, emb, train, skips.pop())
        assert not skips

        x = EDMGroupNorm(name="out_norm", dtype=self.dtype)(x, silu=True)
        x = EDMConv(
            self.out_channels, 3, init=INIT_ZERO, dtype=self.dtype, name="out_conv"
        )(x).astype(out_dtype)
        if return_skips:
            return x, skips_postunet
        return x


class PostUNetWithSkips(nn.Module):
    """Asymmetric U-Net with injected early-encoder skips
    (reference src/networks.py:337-380).

    A core U-Net at LR resolution (base 64 channels) followed by
    log2(ds_scale) upsampling stages; each stage's blocks receive a skip
    formed by nearest-upsampling an early encoder feature map and passing it
    through a learned 3x3 conv + SiLU.
    """

    img_resolution: Tuple[int, int]  # LR resolution of the core U-Net
    in_channels: int
    ds_scale: int
    num_res_blocks: int
    channel_mult: Sequence[int]
    out_channels: int
    base_channels: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, t=None, train: bool = False):
        base = self.base_channels
        emb_channels = base * 4
        levels = int(math.log2(self.ds_scale))

        core = UNet(
            img_resolution=self.img_resolution,
            in_channels=self.in_channels,
            out_channels=base,
            model_channels=base,
            num_blocks=self.num_res_blocks,
            channel_mult=tuple(self.channel_mult),
            dtype=self.dtype,
            name="core_unet",
        )
        x, skips_postunet = core(x, train=train, return_skips=True)
        emb = jnp.zeros((x.shape[0], emb_channels), dtype=x.dtype)
        emb = nn.silu(emb)  # zero, matching core's dummy embedding

        for lvl in range(1, levels + 1):
            x = UNetBlock(
                out_channels=x.shape[-1], up=True, init=INIT_DEFAULT,
                name=f"post{lvl}_up", dtype=self.dtype,
            )(x, emb, train)
            for i in range(self.num_res_blocks + 1):
                skip_channels = base // 2**lvl
                # reference indexes encoder skips from the END of the first 3
                # (src/networks.py:372: skips_postunet[-c_skip], c_skip=1..)
                skip = skips_postunet[-(i + 1)]
                up_skip = upsample_nearest(skip, 2**lvl)
                conv_skip = EDMConv(
                    skip_channels, 3, name=f"post{lvl}_skipconv{i}", dtype=self.dtype
                )(up_skip)
                # skip_in form: the concat never materializes (UNetBlock)
                x = UNetBlock(
                    out_channels=base // 2**lvl, init=INIT_DEFAULT,
                    name=f"post{lvl}_block{i}", dtype=self.dtype,
                )(x, emb, train, nn.silu(conv_skip))

        x = EDMGroupNorm(name="out_norm")(x)
        return EDMConv(self.out_channels, 3, name="out_conv", dtype=self.dtype)(
            nn.silu(x)
        )


class PostUNetWithoutSkips(nn.Module):
    """Asymmetric U-Net without extra skips (reference src/networks.py:384-412)."""

    img_resolution: Tuple[int, int]
    in_channels: int
    ds_scale: int
    num_res_blocks: int
    channel_mult: Sequence[int]
    out_channels: int
    base_channels: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, t=None, train: bool = False):
        base = self.base_channels
        emb_channels = base * 4
        levels = int(math.log2(self.ds_scale))

        x = UNet(
            img_resolution=self.img_resolution,
            in_channels=self.in_channels,
            out_channels=base,
            model_channels=base,
            num_blocks=self.num_res_blocks,
            channel_mult=tuple(self.channel_mult),
            dtype=self.dtype,
            name="core_unet",
        )(x, train=train)
        emb = nn.silu(jnp.zeros((x.shape[0], emb_channels), dtype=x.dtype))

        for lvl in range(1, levels + 1):
            x = UNetBlock(
                out_channels=x.shape[-1], up=True, init=INIT_DEFAULT,
                name=f"post{lvl}_up", dtype=self.dtype,
            )(x, emb, train)
            for i in range(self.num_res_blocks + 1):
                x = UNetBlock(
                    out_channels=base // 2**lvl, init=INIT_DEFAULT,
                    name=f"post{lvl}_block{i}", dtype=self.dtype,
                )(x, emb, train)

        x = EDMGroupNorm(name="out_norm")(x)
        return EDMConv(self.out_channels, 3, name="out_conv", dtype=self.dtype)(
            nn.silu(x)
        )


class UNetAll(nn.Module):
    """Dispatcher over the three U-Net variants (reference src/networks.py:416-432)."""

    type: str
    img_resolution: Tuple[int, int]
    in_channels: int
    ds_scale: int
    num_res_blocks: int
    channel_mult: Sequence[int]
    out_channels: int
    model_channels: int = 16
    dropout: float = 0.10
    dtype: Any = None

    @nn.compact
    def __call__(self, x, t=None, train: bool = False):
        if self.type == "symmetric":
            return UNet(
                img_resolution=self.img_resolution,
                in_channels=self.in_channels,
                out_channels=self.out_channels,
                model_channels=self.model_channels,
                channel_mult=tuple(self.channel_mult),
                num_blocks=self.num_res_blocks,
                dropout=self.dropout,
                dtype=self.dtype,
                name="unet",
            )(x, train=train)
        lr_res = (
            self.img_resolution[0] // self.ds_scale,
            self.img_resolution[1] // self.ds_scale,
        )
        if self.type == "asymmetric_wskips":
            cls = PostUNetWithSkips
        elif self.type == "asymmetric_woskips":
            cls = PostUNetWithoutSkips
        else:
            raise ValueError(f'Invalid UNet type "{self.type}"')
        return cls(
            img_resolution=lr_res,
            in_channels=self.in_channels,
            ds_scale=self.ds_scale,
            num_res_blocks=self.num_res_blocks,
            channel_mult=tuple(self.channel_mult),
            out_channels=self.out_channels,
            dtype=self.dtype,
            name="unet",
        )(x, t=t, train=train)
