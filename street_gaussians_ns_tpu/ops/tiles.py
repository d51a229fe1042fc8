"""Tile binning: (gaussian, tile) pair expansion, depth sort, per-tile ranges.

TPU-native replacement for gsplat's CUDA tile-intersection + GPU radix sort
over packed (tileID, depth) keys (SURVEY.md C-N1). Everything here is
fixed-shape and jit-safe, and engineered around what is fast on TPU:

  * gaussians are depth-sorted FIRST (an (N,)-sized sort, much smaller
    than the pair list), so pair expansion enumerates pairs already in
    depth order within each gaussian run;
  * the "ragged repeat" (slot -> owning gaussian) uses the scatter+cumsum
    trick instead of a searchsorted — a log(N)-round gather loop over
    millions of slots is the slowest thing XLA:TPU can do, while a scatter
    and a prefix sum are single passes;
  * the pair sort then needs only ONE int32 key (tile id) with a stable
    sort — stability preserves the within-tile depth order established by
    the expansion (exactly gsplat's (tile, depth) radix order);
  * per-tile [start, end) ranges come from a small (T,)-query searchsorted;
  * align_bins re-packs ranges to 128-slot alignment for the Pallas DMA
    with a direct position scatter (no per-slot search).

The resulting order matches the oracle's global stable depth sort per tile
bit-for-bit (ties broken by pre-sort index).
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


def _owner_by_scatter(starts: jax.Array, capacity: int, n: int) -> jax.Array:
    """slot -> index of the owning run: for runs with exclusive-cumsum
    `starts`, owner[s] = (# runs with start <= s) - 1. Zero-length runs
    share a start with their successor and are correctly skipped (the
    later scatter-add wins in the cumsum)."""
    seg = jnp.zeros((capacity,), jnp.int32)
    seg = seg.at[jnp.clip(starts, 0, capacity - 1)].add(1, mode="drop")
    return jnp.cumsum(seg) - 1


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

    n = proj.depths.shape[0]
    visible = proj.num_tiles_hit > 0
    depth_key = jnp.where(visible, proj.depths, jnp.inf)
    # Depth-sort the GAUSSIANS (small sort); pair expansion then yields
    # pairs depth-ordered within every tile for free.
    _, order = jax.lax.sort((depth_key, jnp.arange(n, dtype=jnp.int32)),
                            num_keys=1, is_stable=True)

    counts = proj.num_tiles_hit[order].astype(jnp.int32)     # (N,) sorted
    cum = jnp.cumsum(counts)
    total = cum[-1] if n > 0 else jnp.int32(0)
    starts = cum - counts

    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    gs = _owner_by_scatter(jnp.where(counts > 0, starts, max_pairs), max_pairs, n)
    gs = jnp.clip(gs, 0, n - 1)
    valid = slot < total

    g = order[gs]                                            # original index
    box = proj.tile_box[g]                                   # (max_pairs, 4)
    local = slot - starts[gs]
    w = jnp.maximum(box[:, 1] - box[:, 0], 1)
    tx = box[:, 0] + local % w
    ty = box[:, 2] + local // w
    tile_id = ty * ntx + tx
    tile_id = jnp.where(valid, tile_id, num_tiles)           # sentinel last

    # Single-key stable sort: preserves depth order within each tile.
    tile_sorted, gauss_sorted = jax.lax.sort((tile_id, g), num_keys=1,
                                             is_stable=True)
    pair_valid = tile_sorted < num_tiles

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tids, side="left").astype(
        jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tids, side="right").astype(
        jnp.int32)

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
    multiple of `align` and spans a multiple of `align` slots (pad slots
    are invalid pairs). The Pallas kernel DMAs `align`-pair rows from HBM,
    and Mosaic requires lane-tiling-aligned slices.

    Implemented as a direct position scatter: pair i of tile t moves to
    aligned_start[t] + (i - tile_start[t]). One gather + one scatter.
    Output capacity is bins.gauss_idx.shape[0] + num_tiles*align (static).
    """
    num_tiles = bins.tile_start.shape[0]
    max_pairs = bins.gauss_idx.shape[0]
    cap = max_pairs + num_tiles * align

    counts = bins.tile_count
    padded = ((counts + align - 1) // align) * align          # (T,)
    new_start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(padded)[:-1].astype(jnp.int32)])

    # Owning tile of each ORIGINAL pair slot (valid pairs only): tiles are
    # contiguous runs in the sorted list, so reuse the scatter trick over
    # tile_start (zero-count tiles skipped the same way).
    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    t_of = _owner_by_scatter(
        jnp.where(counts > 0, bins.tile_start, max_pairs), max_pairs,
        num_tiles)
    t_of = jnp.clip(t_of, 0, num_tiles - 1)
    pos = new_start[t_of] + (slot - bins.tile_start[t_of])
    pos = jnp.where(bins.pair_valid, pos, cap)               # drop invalid

    gauss = jnp.zeros((cap,), jnp.int32).at[pos].set(bins.gauss_idx,
                                                     mode="drop")
    valid = jnp.zeros((cap,), bool).at[pos].set(bins.pair_valid, mode="drop")

    return TileBins(
        gauss_idx=gauss,
        pair_valid=valid,
        tile_start=new_start,
        tile_count=padded,          # aligned span; pad slots invalid
        num_pairs=bins.num_pairs,
        num_tiles_x=bins.num_tiles_x,
        num_tiles_y=bins.num_tiles_y,
    )
