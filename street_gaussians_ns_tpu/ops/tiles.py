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
    num_pairs: jax.Array    # () int32 true number of pairs (may exceed
    #                         max_pairs; bin_and_pack reports the exact
    #                         capacity-independent count, bin_gaussians a
    #                         count that is exact while rowruns fit)
    num_rowruns: jax.Array  # () int32 true (gaussian, tile-row) run count
    #                         (may exceed max_rowruns — the host growth
    #                         rule must watch BOTH capacities)
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

    @property
    def max_tile_count(self) -> jax.Array:
        """() int32: densest tile's pair count (within pair capacity).

        The truncation watch-counter for the PORTABLE compositors: the
        chunked/scan paths render at most `max_per_tile` splats per tile
        and silently drop the rest, so callers running those impls must
        compare this against their `max_per_tile` (the trainer surfaces
        it as a metric and warns). The Pallas path streams unbounded
        tile ranges and never truncates."""
        return jnp.max(self.tile_count)


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


def _row_trim_counts(conics, xys, box, tile_size: int, max_h: int,
                     q=9.0):
    """Per-gaussian row trim + exact pair count, gather-free.

    Bounded loop over the tile-box rows evaluating the shared coverage
    predicate (core.projection.row_tile_range): returns (first, last,
    count) where [first, last] are the box-relative indices of the first/
    last row with nonzero tile-column width and count is the total
    (gaussian, tile) pair count. The ellipse x-slices are concave/convex
    in y, so nonzero-width rows form a CONTIGUOUS interval — trimming the
    box to [first, last] guarantees every enumerated tile row emits >= 1
    pair (the invariant the Pallas ragged-expansion window relies on) and
    `count` replaces the two 1M-element 1D gathers that previously
    recovered per-gaussian pair counts from the level-2 cumsum (~27 ms of
    a ~220 ms step on v5e; this loop is ~2 ms of pure VPU work)."""
    from ..core.projection import row_tile_range

    y0b = box[:, 2]
    h = box[:, 3] - box[:, 2]
    # One broadcast (N, max_h) evaluation instead of a sequential fori:
    # XLA fuses the whole per-(gaussian, row) computation with the three
    # reductions into a single pass (a while loop would round-trip the
    # carries through HBM every iteration — measured 10x slower).
    i = jnp.arange(max_h, dtype=jnp.int32)[None, :]
    ty = y0b[:, None] + i
    qb = q[:, None] if jnp.ndim(q) else q
    x0, x1 = row_tile_range(conics[:, None, :], xys[:, None, :],
                            box[:, None, :], ty, tile_size, qb)
    w = jnp.where(i < h[:, None], x1 - x0, 0)          # (N, max_h)
    nz = w > 0
    any_nz = jnp.any(nz, axis=1)
    # min/max index reductions instead of argmax + a reversed argmax (the
    # reverse materializes a second (N, max_h) array).
    first = jnp.min(jnp.where(nz, i, max_h), axis=1).astype(jnp.int32)
    last = jnp.max(jnp.where(nz, i, -1), axis=1).astype(jnp.int32)
    cnt = jnp.sum(w, axis=1)
    minus1 = jnp.full_like(y0b, -1)
    return (jnp.where(any_nz, first, minus1),
            jnp.where(any_nz, last, minus1), cnt)


def bin_and_pack(
    xys: jax.Array,          # (N, 2) screen centers
    conics: jax.Array,       # (N, 3)
    tile_box: jax.Array,     # (N, 4) int32 [x0, x1, y0, y1)
    depth_key: jax.Array,    # (N,) f32; +inf marks invisible gaussians
    colors: jax.Array,       # (N, C<=4) per-splat colors (rgb+depth)
    opacities: jax.Array,    # (N,)
    width: int,
    height: int,
    tile_size: int,
    max_pairs: int,
    max_rowruns: int | None = None,
    interpret: bool = False,
    with_gauss_idx: bool = True,
    last_color_is_depth: bool = False,
    precision: str = "f32",
    depth_slice=None,
):
    """Fused binning + per-pair feature threading — zero row gathers.

    Same pair enumeration and ordering as `bin_gaussians` (row-adaptive
    two-level ragged expansion, single-key stable pair sort), but every
    per-gaussian attribute RIDES the data movement instead of being
    gathered after the fact:

      * the depth sort carries all attribute columns as sort payloads
        (payload columns through `lax.sort` cost ~1/20th of the row
        gather they replace on v5e);
      * both ragged expansion levels run the Pallas one-hot-matmul
        expansion kernel (ops.expand_pallas) instead of the owner-mark
        scatter + cummax + row-gather scheme;
      * the (tile, depth) pair sort carries the 10 kernel feature
        columns, so the compositor's (max_pairs, NFEAT) stream needs no
        per-pair gather at all (the old `_build_feat` table gather was
        ~85 ms of an ~300 ms step at 1M gaussians).

    Returns (TileBins, feats) where feats is the list of 10 sorted-pair-
    order feature columns [x, y, ca, cb, cc, op, c0..c3] (each
    (max_pairs,) f32; invalid pairs hold zeros — the compositor's inert
    sentinel rows).

    Sort-payload diet knobs (every payload column costs ~0.6 ms per M
    pairs through `lax.sort` on v5e):
      * with_gauss_idx=False skips threading the gaussian index through
        the expansions and the pair sort (production fused path: nothing
        reads `gauss_idx` — `exp_slot` drives the gradient reduce);
        `gauss_idx` comes back zero-filled.
      * last_color_is_depth=True asserts colors[:, -1] == the depth the
        caller derived depth_key from (for visible gaussians): that
        column then rides the depth sort as the KEY itself instead of a
        separate payload.
      * tile_box rides the depth sort packed 4x8-bit in ONE int32 column
        when the tile grid fits (ntx, nty < 256 — images up to ~4080 px;
        falls back to 4 columns otherwise).

    depth_slice=(start, size) — MODEL-SHARDED binning (round 4): bin only
    the depth-contiguous slice of `size` gaussians beginning at depth RANK
    `start` (a traced, device-varying scalar under shard_map; `size` is
    static). The depth sort still runs over the full N (its payload
    columns are the cheap part — ~3.5 ms replicated at 1M), but
    everything pair-shaped downstream — row trim, both ragged expansions,
    the pair sort, the kernel stream, the gradient reduce's rank sort —
    is sized by the CALLER-PASSED max_rowruns/max_pairs, which the
    sharded path sets to ~1/M of the full-scene capacity. Because slices
    partition the global depth-rank order, per-slice (accum, T) layers
    composite EXACTLY in global depth order via the associative
    over-operator merge (C, T) |> (C', T') = (C + T*C', T*T') — see
    parallel.sharded. The threaded rank column carries GLOBAL ranks, so
    the ranked gradient reduce lands slice gradients into the full-N
    arrays with the unchanged depth_order un-sort.

    precision="bf16" (production TPU mode) rounds the non-geometry
    feature columns (conics, opacity, colors) to bf16 and rides them as
    int32 bf16-PAIRS through both sorts — 4 payload columns fewer in each
    (~12 ms of the bench step; see ops.packing). Screen xy and the depth
    rank stay f32/exact — xy rounding would move splat centers by up to
    pixels for large splats; the rank must be exact. The rounding is
    applied BEFORE pair enumeration, so binning, compositing, and the
    backward replay all see the same (rounded) values — the pipeline
    remains self-consistent, merely quantized (~2^-8 relative on alpha
    curvature and colors; sub-1e-2 on rendered RGB)."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    if max_rowruns is None:
        max_rowruns = max_pairs // 2
    cols, full_order, n = _depth_sort_cols(
        xys, conics, tile_box, depth_key, colors, opacities, ntx, nty,
        last_color_is_depth, precision)
    return _bin_sorted(cols, full_order, n, depth_slice, width, height,
                       tile_size, max_pairs, max_rowruns, interpret,
                       with_gauss_idx, precision)


def _depth_sort_cols(xys, conics, tile_box, depth_key, colors, opacities,
                     ntx, nty, last_color_is_depth, precision):
    """Phase 1 of bin_and_pack: the full-N depth sort with every
    per-gaussian column riding as payload. Returns (cols, full_order, n)
    where cols is the 16-tuple of depth-ordered columns
    (dk, idx, x, y, ca, cb, cc, op, x0, x1, y0, y1, f0, f1, f2, f3).
    Split out (round 5) so the single-chip depth-slice decomposition and
    the model-sharded path can pay this ONCE and bin k slices from it."""
    n = depth_key.shape[0]
    nc = colors.shape[-1]
    assert nc <= 4
    tile_box = tile_box.astype(jnp.int32)

    # Depth sort with every column as payload (ints ride as int32).
    nc_ride = nc - 1 if (last_color_is_depth and nc > 0) else nc
    pack_box = ntx < 256 and nty < 256
    if pack_box:
        box_cols = ((tile_box[:, 0] << 24) | (tile_box[:, 1] << 16)
                    | (tile_box[:, 2] << 8) | tile_box[:, 3],)
    else:
        box_cols = (tile_box[:, 0], tile_box[:, 1],
                    tile_box[:, 2], tile_box[:, 3])
    bf16 = precision == "bf16"
    fcols = [colors[:, i].astype(jnp.float32) for i in range(nc_ride)]
    if bf16:
        from .packing import pack2, unpack2

        attr_cols = [pack2(conics[:, 0], conics[:, 1]),
                     pack2(conics[:, 2], opacities.astype(jnp.float32))]
        attr_cols += [pack2(fcols[i], fcols[i + 1])
                      for i in range(0, nc_ride - 1, 2)]
        if nc_ride % 2:
            attr_cols.append(pack2(fcols[-1], jnp.zeros((n,), jnp.float32)))
        n_attr = len(attr_cols)
    else:
        attr_cols = [conics[:, 0], conics[:, 1], conics[:, 2],
                     opacities.astype(jnp.float32)] + fcols
        n_attr = len(attr_cols)
    cols = (
        jnp.arange(n, dtype=jnp.int32),               # original index
        xys[:, 0], xys[:, 1],
        *attr_cols,
    ) + box_cols
    # num_keys=2 UNSTABLE with the (unique) index as tiebreak key: the
    # order is IDENTICAL to the stable single-key sort, but XLA's stable
    # lowering appends a hidden iota tiebreak operand — measured ~0.5 ms
    # at 1M rows / ~3 ms at 3.4M (tools/bench_sort_ops.py, round 4); the
    # index column rides anyway, so the exactness is free.
    dk_s, idx_s, *c_s = jax.lax.sort((depth_key,) + cols, num_keys=2,
                                     is_stable=False)
    x_s, y_s = c_s[:2]
    if bf16:
        ca_s, cb_s = unpack2(c_s[2])
        cc_s, op_s = unpack2(c_s[3])
        f_s = []
        for j in range(4, 2 + n_attr):
            a, b = unpack2(c_s[j])
            f_s += [a, b]
        f_s = f_s[:nc_ride]
    else:
        ca_s, cb_s, cc_s, op_s = c_s[2:6]
        f_s = list(c_s[6:2 + n_attr])
    if last_color_is_depth and nc > 0:
        # The sorted key IS the last color column at every enumerated
        # pair. Invisible gaussians carry +inf in the KEY and emit no
        # pairs — but the column value must be SANITIZED before it rides
        # the expansion kernels: their one-hot MXU matmuls multiply every
        # window entry by 0/1, and inf * 0 = NaN would contaminate every
        # output block whose source window contains an invisible
        # gaussian (the bug this guards against poisoned the whole
        # gradient at train scale).
        dcol = jnp.where(jnp.isfinite(dk_s), dk_s, 0.0)
        if bf16:
            # The appended depth column rides expand_ragged PAST n_exact,
            # whose contract requires bf16-exact rows there. The depth KEY
            # stays f32 (ordering exact); only the threaded color-channel
            # copy is rounded — explicitly, here, so the quantization is
            # part of the pipeline's self-consistent bf16 rounding rather
            # than an implicit artifact of the expansion kernel.
            dcol = dcol.astype(jnp.bfloat16).astype(jnp.float32)
        f_s.append(dcol)
    f_s += [jnp.zeros((n,), jnp.float32) for _ in range(4 - nc)]
    f0_s, f1_s, f2_s, f3_s = f_s
    if pack_box:
        bx = c_s[2 + n_attr]
        x0_s = (bx >> 24) & 0xFF    # mask: >>24 of a sign-bit pack is arithmetic
        x1_s = (bx >> 16) & 0xFF
        y0_s = (bx >> 8) & 0xFF
        y1_s = bx & 0xFF
    else:
        x0_s, x1_s, y0_s, y1_s = c_s[2 + n_attr:6 + n_attr]
    return ((dk_s, idx_s, x_s, y_s, ca_s, cb_s, cc_s, op_s,
             x0_s, x1_s, y0_s, y1_s, f0_s, f1_s, f2_s, f3_s), idx_s, n)


def _trim_full(cols, tile_size, nty):
    """Full-N row trim over depth-sorted columns (see _row_trim_counts).
    Pay ONCE; per-slice callers pass the result via _bin_sorted(trim=...)
    so k pair-balanced windows don't redo the (N, nty) broadcast."""
    from ..core.projection import coverage_q

    (dk_s, idx_s, x_s, y_s, ca_s, cb_s, cc_s, op_s,
     x0_s, x1_s, y0_s, y1_s, *_f) = cols
    box_s = jnp.stack([x0_s, x1_s, y0_s, y1_s], axis=-1)
    return _row_trim_counts(
        jnp.stack([ca_s, cb_s, cc_s], axis=-1),
        jnp.stack([x_s, y_s], axis=-1), box_s, tile_size, nty,
        q=coverage_q(op_s))


def _bin_sorted(cols, full_order, n, depth_slice, width, height,
                tile_size, max_pairs, max_rowruns, interpret,
                with_gauss_idx, precision, rank_window=None, trim=None,
                local_window=None):
    """Phase 2 of bin_and_pack: slice window -> row trim -> two ragged
    expansions -> pair sort -> tile ranges, all sized by the caller's
    max_rowruns/max_pairs. `cols` comes from _depth_sort_cols; the bf16
    rounding is already baked into the column VALUES there — `precision`
    here only selects the expansion kernels' exact-prefix split and the
    pair sort's packed payload layout.

    Two ways to restrict to a depth-rank window:
      * depth_slice=(start, size): dynamic_slice with STATIC size —
        the model-sharded path (equal gaussian counts per device);
      * rank_window=(lo, hi): TRACED bounds over the FULL columns,
        applied as a count mask — the single-chip pair-BALANCED slicing,
        where window sizes are data-dependent (near ranks emit far more
        pairs per gaussian, measured 1.68x demand imbalance at k=2 for
        equal-count slices). Out-of-window rows keep zero counts; they
        form contiguous zero-run prefixes/suffixes the expansion
        kernel's monotone window machinery skips.
    `local_window=(lo, hi)` (traced), with depth_slice=(anchor, SIZE):
    only local rows [lo, hi) of the STATIC-size window are live — the
    sharded pair-balanced windows (parallel.sharded): static per-device
    window SIZE (2x the equal split) anchored at min(b_m, n - SIZE) with
    traced balanced occupancy inside it, so gaussian-shaped work stays
    ~2/M while pair loads balance (the anchor clamp keeps dynamic_slice
    from silently shifting the composited ranks near the tail).
    `trim` optionally passes precomputed _trim_full output (FULL-N; it
    is windowed here alongside the columns)."""
    from ..core.projection import coverage_q, row_tile_range
    from .expand_pallas import expand_ragged
    from .scan_pallas import cumsum_flat

    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    num_tiles = ntx * nty
    (dk_s, idx_s, x_s, y_s, ca_s, cb_s, cc_s, op_s,
     x0_s, x1_s, y0_s, y1_s, f0_s, f1_s, f2_s, f3_s) = cols
    bf16 = precision == "bf16"
    assert depth_slice is None or rank_window is None

    # Model-sharded slice: keep the FULL depth order (the gradient
    # reduce's final un-sort needs it), then restrict every per-gaussian
    # column to the slice's depth-rank window. dynamic_slice (static
    # size, traced start) — each shard_map device passes its own start.
    if depth_slice is not None:
        sl_start, sl_size = depth_slice
        sl_start = jnp.asarray(sl_start, jnp.int32)

        def dsl(a):
            return jax.lax.dynamic_slice_in_dim(a, sl_start, sl_size)

        (dk_s, idx_s, x_s, y_s, ca_s, cb_s, cc_s, op_s,
         x0_s, x1_s, y0_s, y1_s) = map(dsl, (
            dk_s, idx_s, x_s, y_s, ca_s, cb_s, cc_s, op_s,
            x0_s, x1_s, y0_s, y1_s))
        f0_s, f1_s, f2_s, f3_s = (dsl(f0_s), dsl(f1_s), dsl(f2_s),
                                  dsl(f3_s))
        rank0 = sl_start
        nloc = sl_size
    else:
        rank0 = jnp.int32(0)
        nloc = n

    # Trim each box to its nonzero-width rows + exact per-gaussian pair
    # count (gather-free; also guarantees counts >= 1 per enumerated row,
    # the expansion kernel's window invariant).
    if trim is not None:
        first, last, count_g = trim
        if depth_slice is not None:
            first, last, count_g = map(dsl, (first, last, count_g))
    else:
        sliced_cols = (dk_s, idx_s, x_s, y_s, ca_s, cb_s, cc_s, op_s,
                       x0_s, x1_s, y0_s, y1_s)
        first, last, count_g = _trim_full(sliced_cols, tile_size, nty)
    nz = jnp.isfinite(dk_s) & (count_g > 0)
    if rank_window is not None:
        win_lo, win_hi = rank_window
        ridx = jnp.arange(n, dtype=jnp.int32)
        nz = nz & (ridx >= win_lo) & (ridx < win_hi)
    if local_window is not None:
        lidx = jnp.arange(nloc, dtype=jnp.int32)
        nz = nz & (lidx >= local_window[0]) & (lidx < local_window[1])
    count_g = jnp.where(nz, count_g, 0)
    # Capacity-INDEPENDENT totals: the host's capacity-growth rule reads
    # these, so they must report the true workload even when the static
    # max_rowruns / max_pairs buffers overflowed (rendering drops the
    # overflow pairs for this step; growth then recompiles).
    true_pairs = jnp.sum(count_g)
    y0t = jnp.where(nz, y0_s + first, 0)
    y1t = jnp.where(nz, y0_s + last + 1, 0)
    hrows = jnp.where(nz, y1t - y0t, 0)

    # Row 2 carries the per-pair identity the caller needs downstream:
    # the ORIGINAL index when gauss_idx is requested, else the DEPTH RANK
    # (the gradient reduce sums per rank and un-sorts once at the end —
    # exact in f32 far beyond any gaussian count). Under depth_slice the
    # rank is GLOBAL (rank0 offset), so slice gradients land in the
    # full-N rank arrays.
    ident = (idx_s if with_gauss_idx
             else rank0 + jnp.arange(nloc, dtype=jnp.int32)
             ).astype(jnp.float32)

    # Expansion column layout: the EXACT-f32 prefix first (screen xy and
    # the big ints: rank, run starts, tile ids), then columns that are
    # exactly representable in bf16 — small ints (box coords < 256, hit
    # flag) and, in bf16 precision mode, the already-rounded attribute
    # columns. The expansion kernel then runs its bf16x3 term stacking
    # on the prefix only (n_exact), cutting its matmul lhs by ~1/3.
    # In f32 mode the attributes need exactness, so n_exact covers all.
    # Level 1: gaussians -> (gaussian, tile-row) runs.
    cum_r = cumsum_flat(hrows, interpret=interpret)
    starts_r = cum_r - hrows
    src16 = jnp.stack([
        x_s, y_s, ident, starts_r.astype(jnp.float32),
        x0_s.astype(jnp.float32), x1_s.astype(jnp.float32),
        y0t.astype(jnp.float32), y1t.astype(jnp.float32),
        ca_s, cb_s, cc_s, op_s, f0_s, f1_s, f2_s, f3_s,
    ])                                               # (16, N)
    r = expand_ragged(src16, starts_r, cum_r, max_rowruns,
                      interpret=interpret,
                      n_exact=4 if bf16 else 16)     # (16, MR)
    rr = jnp.arange(max_rowruns, dtype=jnp.int32)
    rstart = r[3].astype(jnp.int32)
    ty = r[6].astype(jnp.int32) + (rr - rstart)
    rbox = jnp.stack([r[4], r[5], r[6], r[7]], -1).astype(jnp.int32)
    rvalid = rr < jnp.minimum(cum_r[-1] if nloc > 0 else jnp.int32(0),
                              max_rowruns)
    # Zero-filled (uncovered) slots have y1b == 0 => in_row False => wr 0.
    x0r, x1r = row_tile_range(
        jnp.stack([r[8], r[9], r[10]], -1), jnp.stack([r[0], r[1]], -1),
        rbox, ty, tile_size, coverage_q(r[11]))
    wr = jnp.where(rvalid, x1r - x0r, 0)

    # Level 2: runs -> pairs.
    cum2 = cumsum_flat(wr, interpret=interpret)
    starts2 = cum2 - wr
    total = cum2[-1] if nloc > 0 else jnp.int32(0)
    src14 = jnp.concatenate([
        r[0:3],                                       # x, y, ident
        (ty * ntx + x0r).astype(jnp.float32)[None],   # first tile of row
        starts2.astype(jnp.float32)[None],
        jnp.ones((1, max_rowruns), jnp.float32),      # hit flag
        r[8:16],                                      # ca..op, f0..f3
    ])                                                # (14, MR)
    p = expand_ragged(src14, starts2, cum2, max_pairs,
                      interpret=interpret,
                      n_exact=5 if bf16 else 14)      # (14, MP)
    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    hit = p[5] > 0.5
    valid = (slot < total) & hit
    g = jnp.where(valid, p[2].astype(jnp.int32), n)
    tile_id = jnp.where(
        valid, p[3].astype(jnp.int32) + (slot - p[4].astype(jnp.int32)),
        num_tiles)

    # Per-rank pair counts come from the analytic row loop above (exactly
    # the level-2 enumeration's widths, summed per gaussian). NOTE: if the
    # rowrun capacity overflows (cum_r[-1] > max_rowruns) the bookkeeping
    # of ranks past the overflow point degrades to zero-grad ranges
    # (rendering is already dropping their pairs in that regime).
    count_g = jnp.where(starts_r < max_rowruns, count_g, 0)
    exp_starts = cumsum_flat(count_g, interpret=interpret) - count_g

    # Single-key stable sort; the feature columns ride as payloads.
    # Production (with_gauss_idx=False) rides 11 columns — the 10 kernel
    # features plus the DEPTH RANK (p[10], masked to sentinel n on dead
    # slots) — and skips the slot + gauss-index payloads entirely (the
    # rank-keyed gradient reduce needs neither; each payload is
    # ~0.6 ms/M pairs).
    # All pair sorts run num_keys=2 UNSTABLE with a per-pair-unique (or
    # dead-slot-only-tied) second key: identical order to the stable
    # single-key sort, minus XLA's hidden stability-iota operand (~3 ms
    # at bench scale — tools/bench_sort_ops.py round 4). Dead slots tie
    # on (num_tiles, sentinel) and may permute among themselves; their
    # lanes are masked by the kernels' count test, so content order there
    # is irrelevant.
    pcols = [p[0], p[1], p[6], p[7], p[8], p[9], p[10], p[11], p[12],
             p[13]]          # [x, y, ca, cb, cc, op, f0..f3]
    if with_gauss_idx:
        (tile_sorted, slot_sorted, g_sorted, *feats) = jax.lax.sort(
            (tile_id, slot, g) + tuple(pcols),
            num_keys=2, is_stable=False)
    elif bf16:
        # Production diet: xy f32, the 8 attribute columns as 4 bf16
        # pairs, the depth rank f32 (exact ints) — 8 operands instead of
        # 12 (~10 ms at bench scale; values were already bf16-rounded at
        # the depth sort, so this re-pack is lossless). The rank rides as
        # the SECOND KEY: within-tile depth order guaranteed without
        # stability, and it comes back as a sorted column all the same.
        from .packing import pack2, unpack2

        rank_col = jnp.where(valid, p[2], jnp.float32(n))
        (tile_sorted, rank_s, fx, fy, q0, q1, q2, q3) = jax.lax.sort(
            (tile_id, rank_col, p[0], p[1], pack2(p[6], p[7]),
             pack2(p[8], p[9]), pack2(p[10], p[11]),
             pack2(p[12], p[13])),
            num_keys=2, is_stable=False)
        u0 = unpack2(q0)
        u1 = unpack2(q1)
        u2 = unpack2(q2)
        u3 = unpack2(q3)
        feats = [fx, fy, u0[0], u0[1], u1[0], u1[1], u2[0], u2[1],
                 u3[0], u3[1], rank_s]
        slot_sorted = jnp.zeros_like(tile_sorted)
        g_sorted = jnp.zeros_like(tile_sorted)
    else:
        rank_col = jnp.where(valid, p[2], jnp.float32(n))
        (tile_sorted, rank_s, *feats) = jax.lax.sort(
            (tile_id, rank_col) + tuple(pcols),
            num_keys=2, is_stable=False)
        feats = list(feats) + [rank_s]
        slot_sorted = jnp.zeros_like(tile_sorted)
        g_sorted = jnp.zeros_like(tile_sorted)
    pair_valid = tile_sorted < num_tiles

    # One searchsorted for both bounds: keys are sorted, so tile t's right
    # boundary IS tile t+1's left boundary, and the sentinel row
    # (tile_id == num_tiles for invalid pairs) closes the last tile.
    # (~4.1 ms at bench scale — XLA lowers the 6601 queries as ~22 gather
    # rounds. A rank_rowsum-based histogram + tiny cumsum was tried in
    # round 4 and measured WITHIN the bench's ±3.5 ms run-to-run noise of
    # this version — no demonstrated win for the extra 27 MB stacked
    # operand and kernel, so the simpler searchsorted stays.)
    tids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(tile_sorted, tids, side="left").astype(
        jnp.int32)
    tile_start = bounds[:-1]
    tile_end = bounds[1:]

    bins = TileBins(
        gauss_idx=g_sorted,
        pair_valid=pair_valid,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        num_pairs=true_pairs,
        num_rowruns=cum_r[-1] if nloc > 0 else jnp.int32(0),
        exp_slot=jnp.where(pair_valid, slot_sorted, max_pairs),
        # FULL depth order even under depth_slice: the ranked gradient
        # reduce un-sorts full-N rank sums with it.
        depth_order=full_order,
        exp_starts=exp_starts,
        exp_counts=count_g,
        num_tiles_x=ntx,
        num_tiles_y=nty,
    )
    return bins, feats


def count_pairs(
    proj: Projected,
    width: int,
    height: int,
    tile_size: int,
    opacities: jax.Array | None = None,
):
    """Capacity-free exact (num_pairs, num_rowruns) for one camera.

    The counts are order-independent (a pure per-gaussian row sum), so no
    depth sort and NO static pair/rowrun capacity is needed — this is the
    trainer's pre-sizing probe (round 5): one tiny jit program per camera
    resolution sizes max_pairs/max_rowruns BEFORE the expensive step
    program compiles, so a 30k-step run pays O(1) growth recompiles
    instead of chasing densification up the capacity ladder."""
    from ..core.projection import coverage_q

    nty = (height + tile_size - 1) // tile_size
    n = proj.depths.shape[0]
    visible = proj.num_tiles_hit > 0
    op_col = (opacities.astype(jnp.float32) if opacities is not None
              else jnp.ones((n,), jnp.float32))
    first, last, cnt = _row_trim_counts(
        proj.conics, proj.xys, proj.tile_box.astype(jnp.int32), tile_size,
        nty, q=coverage_q(op_col))
    nz = visible & (cnt > 0)
    # UNTRIMMED box rows: the portable path (bin_gaussians) enumerates
    # full box heights while the fused path trims — sizing from the
    # larger convention keeps the probe safe for both (slightly
    # conservative for pallas).
    box = proj.tile_box.astype(jnp.int32)
    rowruns = jnp.where(visible, box[:, 3] - box[:, 2], 0)
    return jnp.sum(jnp.where(nz, cnt, 0)), jnp.sum(rowruns)


def bin_gaussians(
    proj: Projected,
    width: int,
    height: int,
    tile_size: int,
    max_pairs: int,
    max_rowruns: int | None = None,
    opacities: jax.Array | None = None,
) -> TileBins:
    """Row-adaptive pair expansion: each (gaussian, tile-row) run
    enumerates only the tile columns its coverage ELLIPSE covers in that
    row (core.projection.row_tile_range; opacity-aware when `opacities`
    is given — pass the same values the compositor receives, and build
    `proj` with the same opacities so the tile box matches) instead of
    the full bounding box — for diagonal anisotropic splats this sheds ~30-40% of the
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
    # pairs depth-ordered within every tile for free. 2-key unstable ==
    # stable 1-key order (unique index tiebreak; see bin_and_pack).
    _, order = jax.lax.sort((depth_key, jnp.arange(n, dtype=jnp.int32)),
                            num_keys=2, is_stable=False)

    # One (N, 11) f32 row gather brings every per-gaussian quantity into
    # depth order (ints are exact in f32 far beyond these ranges).
    from ..core.projection import row_tile_range
    from .scan_pallas import cumsum_flat

    from ..core.projection import coverage_q

    op_col = (opacities.astype(jnp.float32) if opacities is not None
              else jnp.ones((n,), jnp.float32))
    tab = jnp.concatenate([
        proj.xys,                                    # 0:2
        proj.conics,                                 # 2:5
        proj.tile_box.astype(jnp.float32),           # 5:9
        op_col[:, None],                             # 9 opacity
        jnp.arange(n, dtype=jnp.float32)[:, None],   # 10 original index
    ], axis=-1)
    tab_s = tab[order]                               # (N, 11)
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
    rstart = rtab[:, 11].astype(jnp.int32)
    rbox = rtab[:, 5:9].astype(jnp.int32)
    ty = rbox[:, 2] + (rr - rstart)
    rvalid = rr < jnp.minimum(cum_r[-1] if n > 0 else jnp.int32(0),
                              max_rowruns)
    rq = (coverage_q(rtab[:, 9]) if opacities is not None
          else jnp.float32(9.0))
    x0r, x1r = row_tile_range(rtab[:, 2:5], rtab[:, 0:2], rbox, ty,
                              tile_size, rq)
    wr = jnp.where(rvalid, x1r - x0r, 0)

    # Level 2: runs -> pairs.
    cum2 = cumsum_flat(wr)
    starts2 = cum2 - wr
    total = cum2[-1] if n > 0 else jnp.int32(0)
    owner2 = jnp.clip(
        _owner_by_scatter(jnp.where(wr > 0, starts2, max_pairs),
                          max_pairs, max_rowruns), 0, max_rowruns - 1)
    rtab_i = jnp.stack([rtab[:, 10].astype(jnp.int32),
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

    # (tile, slot) 2-key unstable sort: the unique slot tiebreak
    # reproduces the stable order (depth order within each tile) without
    # XLA's hidden stability operand. The slot doubles as the sort
    # permutation for the backward; carrying g through the sort is ~2x
    # cheaper than recovering it with a per-pair gather afterwards.
    tile_sorted, slot_sorted, gauss_sorted = jax.lax.sort(
        (tile_id, slot, g), num_keys=2, is_stable=False)
    pair_valid = tile_sorted < num_tiles

    # One searchsorted for both bounds (see bin_and_pack): right boundary
    # of tile t = left boundary of t+1; the invalid-pair sentinel
    # (tile_id == num_tiles) closes the last tile.
    tids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(tile_sorted, tids, side="left").astype(
        jnp.int32)
    tile_start = bounds[:-1]
    tile_end = bounds[1:]

    return TileBins(
        gauss_idx=gauss_sorted,
        pair_valid=pair_valid,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        # Exact while rowruns fit; a LOWER bound under rowrun overflow —
        # num_rowruns (always exact) is what detects that regime.
        num_pairs=total,
        num_rowruns=cum_r[-1] if n > 0 else jnp.int32(0),
        exp_slot=jnp.where(pair_valid, slot_sorted, max_pairs),
        depth_order=order,
        exp_starts=exp_starts,
        exp_counts=count_g,
        num_tiles_x=ntx,
        num_tiles_y=nty,
    )
