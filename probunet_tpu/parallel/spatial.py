"""Spatial-domain parallelism: halo exchange and full-domain tiled inference.

The reference handles the full 280x280 ClimEx domain only implicitly, by
cropping one fixed 128x128 window (reference src/train_prob_unet_model.py:34)
— there is no full-domain inference path and no spatial scaling story
(SURVEY.md §2.5 P4). This module provides both, TPU-natively:

1. :func:`halo_exchange` / :func:`halo_conv2d` — explicit ``shard_map``
   + ``lax.ppermute`` halo exchange along a mesh axis, the building block
   for manually spatially-sharded convolution stacks (and the tested
   demonstration that our collectives ride the mesh correctly; GSPMD does
   the same transformation automatically inside the jitted train step when
   the batch is sharded over the "spatial" axis — see
   parallel.data_parallel).
2. :func:`extract_tiles` / :func:`stitch_tiles` / :func:`tiled_ensemble` —
   overlap-tile decomposition of an arbitrarily large domain into the
   model's native window, ensemble inference over all tiles as one sharded
   batch (tiles ride the "data" axis), and smooth cosine-ramp blending of
   the overlaps back into the full field.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


# ---------------------------------------------------------------------------
# Halo exchange (shard_map + ppermute)
# ---------------------------------------------------------------------------

def halo_exchange(x: jax.Array, halo: int, axis_name: str, axis_size: int,
                  row_axis: int = 1) -> jax.Array:
    """Pad a per-shard block with ``halo`` rows from its mesh neighbours.

    To be called INSIDE ``shard_map``. ``x`` is the local shard, sharded
    along ``row_axis`` (H for NHWC). Edge shards are zero-padded (matching
    'SAME' conv zero padding at the global boundary). Returns a block with
    ``2*halo`` extra rows.
    """
    idx = [(i, (i + 1) % axis_size) for i in range(axis_size)]  # up -> down
    rdx = [(i, (i - 1) % axis_size) for i in range(axis_size)]  # down -> up

    def take(arr, start, size):
        sl = [slice(None)] * arr.ndim
        sl[row_axis] = slice(start, start + size) if start >= 0 else slice(start, None)
        return arr[tuple(sl)]

    # rows I send down to my next neighbour become its top halo
    bottom_rows = take(x, -halo, halo)
    top_halo = lax.ppermute(bottom_rows, axis_name, idx)
    # rows I send up to my previous neighbour become its bottom halo
    top_rows = take(x, 0, halo)
    bottom_halo = lax.ppermute(top_rows, axis_name, rdx)

    # zero the wrapped-around halos at the global edges
    pos = lax.axis_index(axis_name)
    top_halo = jnp.where(pos == 0, jnp.zeros_like(top_halo), top_halo)
    bottom_halo = jnp.where(
        pos == axis_size - 1, jnp.zeros_like(bottom_halo), bottom_halo
    )
    return jnp.concatenate([top_halo, x, bottom_halo], axis=row_axis)


def halo_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    mesh: Mesh,
    axis_name: str = "spatial",
) -> jax.Array:
    """'SAME' NHWC conv over an H-sharded global array via explicit halos.

    Demonstrates/validates the manual spatially-sharded conv path: shard_map
    over ``axis_name``, ppermute halo exchange of (kh-1)//2 rows, then a
    VALID conv on the padded block. Bit-exact vs the unsharded SAME conv.

    x: (B, H, W, C) global array; kernel: (kh, kw, C, O) HWIO.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    halo = (kh - 1) // 2
    n = mesh.shape[axis_name]

    def local(xb, k):
        padded = halo_exchange(xb, halo, axis_name, n, row_axis=1)
        return lax.conv_general_dilated(
            padded, k,
            window_strides=(1, 1),
            padding=((0, 0), ((kw - 1) // 2, (kw - 1) // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    spec_x = P(None, axis_name, None, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(spec_x, P()),
        out_specs=spec_x,
    )(x, kernel)


# ---------------------------------------------------------------------------
# Overlap-tile decomposition for full-domain inference
# ---------------------------------------------------------------------------

def _tile_starts(full: int, tile: int, overlap: int, align: int = 1) -> list[int]:
    """Start offsets covering [0, full) with >= overlap shared pixels.

    ``align`` snaps every origin down to a multiple (e.g. the lowres pooling
    factor, so per-tile pooling equals slicing the global pooled grid)."""
    if tile >= full:
        return [0]
    stride = max(align, (tile - overlap) // align * align)
    last = (full - tile) // align * align
    if last + tile < full:
        raise ValueError(
            f"domain {full} not coverable by aligned tiles (tile={tile}, "
            f"align={align}); pad the domain to a multiple of {align}"
        )
    n = math.ceil(last / stride) + 1 if last else 1
    starts = [min(i * stride, last) for i in range(n)]
    # dedupe while keeping order (tail tiles may clamp to the same start)
    out: list[int] = []
    for s in starts:
        if not out or s != out[-1]:
            out.append(s)
    return out


def extract_tiles(field: np.ndarray | jax.Array, tile: int, overlap: int = 16,
                  align: int = 1):
    """(T, H, W, C) -> ((T*ntiles, tile, tile, C) array, positions).

    positions is a list of (y, x) tile origins, length ntiles.
    """
    t, h, w, c = field.shape
    ys = _tile_starts(h, tile, overlap, align)
    xs = _tile_starts(w, tile, overlap, align)
    positions = [(y, x) for y in ys for x in xs]
    xp = jnp.asarray(field)
    tiles = jnp.stack(
        [xp[:, y:y + tile, x:x + tile, :] for (y, x) in positions], axis=1
    )  # (T, ntiles, tile, tile, C)
    return tiles.reshape(t * len(positions), tile, tile, c), positions


def _ramp_weight(tile: int) -> np.ndarray:
    """(tile, tile) cosine-ramp blending weight, peaked at the tile centre."""
    r = 0.5 - 0.5 * np.cos(2 * np.pi * (np.arange(tile) + 0.5) / tile)
    w = np.outer(r, r)
    return (w + 1e-6).astype(np.float32)


def stitch_tiles(
    tiles: jax.Array,
    positions: Sequence[tuple[int, int]],
    full_hw: tuple[int, int],
) -> jax.Array:
    """Inverse of :func:`extract_tiles` with smooth overlap blending.

    tiles: (T*ntiles, ...extra..., tile, tile, C) — extra leading dims (e.g.
    ensemble members) must come AFTER the flattened (T*ntiles) axis.
    Returns (T, ...extra..., H, W, C).
    """
    ntiles = len(positions)
    tile = tiles.shape[-3]
    h, w = full_hw
    c = tiles.shape[-1]
    lead = tiles.shape[1:-3]  # e.g. (M,) ensemble axis
    t = tiles.shape[0] // ntiles
    tiles = tiles.reshape((t, ntiles) + lead + (tile, tile, c))

    wgt = jnp.asarray(_ramp_weight(tile))[:, :, None]  # (tile, tile, 1)
    acc = jnp.zeros((t,) + lead + (h, w, c), tiles.dtype)
    den = jnp.zeros((h, w, 1), tiles.dtype)
    for i, (y, x) in enumerate(positions):
        blk = tiles[:, i] * wgt
        acc = acc.at[..., y:y + tile, x:x + tile, :].add(blk)
        den = den.at[y:y + tile, x:x + tile, :].add(wgt)
    return acc / den


def tiled_ensemble(
    sample_fn: Callable[[jax.Array, jax.Array], jax.Array],
    hr_full: np.ndarray | jax.Array,
    rng: jax.Array,
    tile: int,
    overlap: int = 16,
    mesh: Mesh | None = None,
    batch_tiles: int | None = None,
) -> jax.Array:
    """Full-domain ensemble inference by overlap tiling.

    ``sample_fn(hr_tile_batch, rng) -> (B, M, tile, tile, C)`` is the
    model's per-window ensemble sampler (e.g. a jitted closure over params +
    stats doing preprocess -> ProbabilisticUNet.sample -> residual_to_hr).
    ``hr_full`` is (T, H, W, C) at any domain size (e.g. ClimEx 280x280).
    Tiles are processed as one big batch; with ``mesh`` given, the tile batch
    is sharded over the mesh's "data" axis so inference scales across chips.
    Returns (T, M, H, W, C).
    """
    t, h, w, c = hr_full.shape
    tiles, positions = extract_tiles(hr_full, tile, overlap)
    n = tiles.shape[0]

    if mesh is not None:
        data_n = mesh.shape.get("data", 1)
        pad = (-n) % data_n
        if pad:
            tiles = jnp.concatenate([tiles, tiles[:pad]], axis=0)
        tiles = jax.device_put(tiles, NamedSharding(mesh, P("data")))

    if batch_tiles is None:
        out = sample_fn(tiles, rng)
    else:
        chunks = []
        for i in range(0, tiles.shape[0], batch_tiles):
            chunks.append(sample_fn(tiles[i:i + batch_tiles],
                                    jax.random.fold_in(rng, i)))
        out = jnp.concatenate(chunks, axis=0)

    out = out[:n]  # drop padding
    return stitch_tiles(out, positions, (h, w))
