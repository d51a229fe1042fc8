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
    the Pallas kernels stream the unaligned ranges directly (dual-row DMA
    + lane rotation), so no aligned re-pack ever exists.

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
    # Pre-sort (gaussian-major "expansion") slot of each sorted pair, and
    # the depth ordering of gaussians — together they let the backward
    # reduce per-pair gradients with gathers + a cumsum instead of a giant
    # scatter-add (see composite_pallas._reduce_pair_grads).
    exp_slot: jax.Array     # (max_pairs,) int32; sentinel max_pairs if invalid
    depth_order: jax.Array  # (N,) int32: depth rank -> original gaussian index
    exp_starts: jax.Array   # (N,) int32 exclusive cumsum of per-rank counts
    exp_counts: jax.Array   # (N,) int32 tiles-hit per depth rank
    num_tiles_x: int = dataclasses.field(metadata=dict(static=True))
    num_tiles_y: int = dataclasses.field(metadata=dict(static=True))


def segment_broadcast(values, bits, starts: jax.Array, capacity: int):
    """Broadcast per-run values to every slot of contiguous runs.

    values: list of (n,) per-run arrays (any dtype); bits: kept for API
    compatibility, unused; starts: (n,) slot index of each run's first
    slot (sentinel >= capacity for empty runs — their values never land).
    Returns the broadcasted (capacity,) arrays. Slots before the first
    run get garbage — callers mask by validity.

    Cost model (measured on v5e at 4.45M slots): XLA scatter is
    ~7.4 ns/ELEMENT, so one int32 owner-mark scatter + a single-pass
    Pallas cummax + one (capacity,)-row gather of the stacked value table
    beats the old scheme (pack all values into C int32 columns, scatter C
    columns, XLA log-pass cummax over (capacity, C)) by ~3x."""
    owner = _owner_by_scatter(starts, capacity, starts.shape[0])
    owner = jnp.clip(owner, 0, starts.shape[0] - 1)
    if len(values) == 1:
        return [values[0][owner]]
    table = jnp.stack([v.astype(jnp.int32) for v in values], axis=-1)
    rows = table[owner]                                      # (capacity, C)
    return [rows[:, i] for i in range(len(values))]


def _owner_by_scatter(starts: jax.Array, capacity: int, n: int) -> jax.Array:
    """slot -> index of the owning run: for runs with exclusive-cumsum
    `starts` (callers pass sentinel >= capacity for zero-length runs),
    owner[s] = the largest run index whose start <= s.

    scatter-SET with unique indices + a cumulative max: XLA:TPU lowers
    non-unique scatter-ADD to a serial update loop (hundreds of ms at
    millions of slots), while unique set-scatter and single-pass scans
    stay vectorized. Marking each run's start with its FULL index also
    keeps indices correct when zero-length runs precede (a compact
    counting scheme would mis-index the full arrays)."""
    from .scan_pallas import cummax_flat

    mark = jnp.full((capacity,), -1, jnp.int32)
    mark = mark.at[starts].set(jnp.arange(n, dtype=jnp.int32), mode="drop",
                               unique_indices=True)
    return cummax_flat(mark)


def bin_gaussians(
    proj: Projected,
    width: int,
    height: int,
    tile_size: int,
    max_pairs: int,
    max_rowruns: int | None = None,
) -> TileBins:
    """Row-adaptive pair expansion: each (gaussian, tile-row) run
    enumerates only the tile columns its 3-sigma ELLIPSE covers in that
    row (core.projection.row_tile_range) instead of the full bounding
    box — for diagonal anisotropic splats this sheds ~30-40% of the
    pairs, and every downstream per-pair cost (sort, feature gather,
    kernel chunks, gradient reduction) scales with pair count. Two-level
    ragged expansion, both levels the same owner-scatter + flat-cummax +
    row-gather pattern; decoding a pair inside a single row is one add
    (the old rectangle decode needed a variable divmod)."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    num_tiles = ntx * nty
    if max_rowruns is None:
        max_rowruns = max_pairs // 2

    n = proj.depths.shape[0]
    visible = proj.num_tiles_hit > 0
    depth_key = jnp.where(visible, proj.depths, jnp.inf)
    # Depth-sort the GAUSSIANS (small sort); pair expansion then yields
    # pairs depth-ordered within every tile for free.
    _, order = jax.lax.sort((depth_key, jnp.arange(n, dtype=jnp.int32)),
                            num_keys=1, is_stable=True)

    # One (N, 11) f32 row gather brings every per-gaussian quantity into
    # depth order (ints are exact in f32 far beyond these ranges).
    from ..core.projection import row_tile_range
    from .scan_pallas import cumsum_flat

    tab = jnp.concatenate([
        proj.xys,                                    # 0:2
        proj.conics,                                 # 2:5
        proj.tile_box.astype(jnp.float32),           # 5:9
        jnp.arange(n, dtype=jnp.float32)[:, None],   # 9 original index
    ], axis=-1)
    tab_s = tab[order]                               # (N, 10)
    box_s = tab_s[:, 5:9].astype(jnp.int32)
    hrows = jnp.where(visible[order], box_s[:, 3] - box_s[:, 2], 0)

    # Level 1: gaussians -> (gaussian, tile-row) runs.
    cum_r = cumsum_flat(hrows)
    starts_r = cum_r - hrows
    owner1 = jnp.clip(
        _owner_by_scatter(jnp.where(hrows > 0, starts_r, max_rowruns),
                          max_rowruns, n), 0, n - 1)
    rr = jnp.arange(max_rowruns, dtype=jnp.int32)
    rtab = jnp.concatenate(
        [tab_s, starts_r.astype(jnp.float32)[:, None]], axis=-1)[owner1]
    rstart = rtab[:, 10].astype(jnp.int32)
    rbox = rtab[:, 5:9].astype(jnp.int32)
    ty = rbox[:, 2] + (rr - rstart)
    rvalid = rr < jnp.minimum(cum_r[-1] if n > 0 else jnp.int32(0),
                              max_rowruns)
    x0r, x1r = row_tile_range(rtab[:, 2:5], rtab[:, 0:2], rbox, ty,
                              tile_size)
    wr = jnp.where(rvalid, x1r - x0r, 0)

    # Level 2: runs -> pairs.
    cum2 = cumsum_flat(wr)
    starts2 = cum2 - wr
    total = cum2[-1] if n > 0 else jnp.int32(0)
    owner2 = jnp.clip(
        _owner_by_scatter(jnp.where(wr > 0, starts2, max_pairs),
                          max_pairs, max_rowruns), 0, max_rowruns - 1)
    rtab_i = jnp.stack([rtab[:, 9].astype(jnp.int32),
                        ty * ntx + x0r, starts2], axis=-1)
    ptab = rtab_i[owner2]                            # (MP, 3)
    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    valid = slot < total
    g = ptab[:, 0]
    tile_id = jnp.where(valid, ptab[:, 1] + (slot - ptab[:, 2]), num_tiles)

    # Per-rank pair counts / starts for the gradient reduction: a rank's
    # rowruns are contiguous, so its pair count is a cum2 difference;
    # exp_starts is recomputed as an exclusive cumsum so empty ranks stay
    # contiguous (the reduce's lo = shift(hi) trick needs that).
    in_cap = (hrows > 0) & (starts_r < max_rowruns)
    last_r = jnp.clip(starts_r + hrows - 1, 0, max_rowruns - 1)
    count_g = jnp.where(
        in_cap, cum2[last_r] - starts2[jnp.clip(starts_r, 0,
                                                max_rowruns - 1)], 0)
    exp_starts = cumsum_flat(count_g) - count_g

    # Single-key stable sort: preserves depth order within each tile. The
    # payloads are the expansion slot (which doubles as the sort
    # permutation for the backward) and the gaussian index — carrying g
    # through the sort is ~2x cheaper than recovering it with a per-pair
    # gather afterwards.
    tile_sorted, slot_sorted, gauss_sorted = jax.lax.sort(
        (tile_id, slot, g), num_keys=1, is_stable=True)
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
        exp_slot=jnp.where(pair_valid, slot_sorted, max_pairs),
        depth_order=order,
        exp_starts=exp_starts,
        exp_counts=count_g,
        num_tiles_x=ntx,
        num_tiles_y=nty,
    )
