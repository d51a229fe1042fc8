"""Tile binning: (gaussian, tile) pair expansion, depth sort, per-tile ranges.

TPU-native replacement for gsplat's CUDA tile-intersection + GPU radix sort
over packed (tileID, depth) keys (SURVEY.md C-N1). Everything here is
fixed-shape and jit-safe:

  * pair expansion uses a searchsorted over the exclusive-cumsum of per-
    gaussian tile counts — a fully vectorized "ragged repeat" with a static
    `max_pairs` capacity (overflow pairs are dropped; the true total is
    returned so callers can log / grow capacity outside jit),
  * the (tile, depth) ordering uses `lax.sort` with two lexicographic keys
    (XLA's sort lowers to an efficient on-chip bitonic/merge network),
  * per-tile [start, end) ranges come from a searchsorted over the sorted
    tile ids.

The sort is stable, so equal-depth splats keep their pre-sort order — the
same tie-break the oracle uses.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.projection import Projected


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileBins:
    """Sorted (gaussian, tile) pairs + per-tile ranges."""

    gauss_idx: jax.Array    # (max_pairs,) int32 gaussian index per sorted pair
    pair_valid: jax.Array   # (max_pairs,) bool
    tile_start: jax.Array   # (num_tiles,) int32 start offset into sorted pairs
    tile_count: jax.Array   # (num_tiles,) int32 number of pairs per tile
    num_pairs: jax.Array    # () int32 true number of pairs (may exceed max_pairs)
    num_tiles_x: int = dataclasses.field(metadata=dict(static=True))
    num_tiles_y: int = dataclasses.field(metadata=dict(static=True))


def bin_gaussians(
    proj: Projected,
    width: int,
    height: int,
    tile_size: int,
    max_pairs: int,
) -> TileBins:
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    num_tiles = ntx * nty

    counts = proj.num_tiles_hit.astype(jnp.int32)          # (N,)
    cum = jnp.cumsum(counts)                               # inclusive
    total = cum[-1] if counts.shape[0] > 0 else jnp.int32(0)
    starts = cum - counts                                  # exclusive cumsum

    n = counts.shape[0]
    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    # Owner gaussian of each pair slot: first g with cum[g] > slot.
    g = jnp.searchsorted(cum, slot, side="right").astype(jnp.int32)
    g = jnp.minimum(g, n - 1)
    valid = slot < total

    box = proj.tile_box[g]                                 # (max_pairs, 4)
    local = slot - starts[g]
    w = jnp.maximum(box[:, 1] - box[:, 0], 1)
    tx = box[:, 0] + local % w
    ty = box[:, 2] + local // w
    tile_id = ty * ntx + tx
    tile_id = jnp.where(valid, tile_id, num_tiles)         # sentinel sorts last
    depth = jnp.where(valid, proj.depths[g], jnp.inf)

    tile_sorted, _, gauss_sorted = jax.lax.sort(
        (tile_id, depth, g), num_keys=2, is_stable=True
    )
    pair_valid = tile_sorted < num_tiles

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tids, side="right").astype(jnp.int32)

    return TileBins(
        gauss_idx=gauss_sorted,
        pair_valid=pair_valid,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        num_pairs=total,
        num_tiles_x=ntx,
        num_tiles_y=nty,
    )


def align_bins(bins: TileBins, align: int) -> TileBins:
    """Re-pack the sorted pair list so every tile's range starts at a
    multiple of `align` and spans a multiple of `align` slots (pad slots are
    invalid pairs). The Pallas kernel DMAs `align`-pair rows from HBM, and
    Mosaic requires lane-tiling-aligned slices — this one gather pass buys
    fully aligned, arbitrary-length per-tile streams.

    Output capacity is bins.gauss_idx.shape[0] + num_tiles*align (static).
    """
    num_tiles = bins.tile_start.shape[0]
    max_pairs = bins.gauss_idx.shape[0]
    cap = max_pairs + num_tiles * align

    counts = bins.tile_count
    padded = ((counts + align - 1) // align) * align          # (T,)
    new_start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(padded)[:-1].astype(jnp.int32)])

    slot = jnp.arange(cap, dtype=jnp.int32)
    # Owner tile of each aligned slot.
    ends = new_start + padded
    t = jnp.searchsorted(ends, slot, side="right").astype(jnp.int32)
    t = jnp.minimum(t, num_tiles - 1)
    local = slot - new_start[t]
    in_tile = (slot < ends[t]) & (local < counts[t])
    src = jnp.clip(bins.tile_start[t] + local, 0, max_pairs - 1)

    gauss = jnp.where(in_tile, bins.gauss_idx[src], 0)
    valid = in_tile & bins.pair_valid[src]

    return TileBins(
        gauss_idx=gauss,
        pair_valid=valid,
        tile_start=new_start,
        tile_count=padded,          # aligned span; invalid slots padded
        num_pairs=bins.num_pairs,
        num_tiles_x=bins.num_tiles_x,
        num_tiles_y=bins.num_tiles_y,
    )
