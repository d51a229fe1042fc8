"""Pallas TPU segmented row-sum: per-segment sums of contiguous runs.

The gradient reduction's core contraction: per-pair gradient rows (in
expansion order, where every gaussian's pairs are contiguous) summed per
depth rank. The XLA formulation (row-cumsum + boundary gather + shifted
difference) spends ~28 ms at 3.5M pairs — almost all of it in the (N, C)
boundary gather, TPU's slowest primitive. This kernel instead grids over
SEGMENT blocks (aligned output, no gather anywhere): each block of 1024
segments streams its pair-chunk span from HBM and accumulates
`acc += chunk (C, 1024) @ onehot (1024 pairs, 128 segs)` on the MXU, with
the one-hot built from the segment bounds by a broadcast compare (the
same idiom as ops.expand_pallas, in the contracting direction).

Stride: 1024 pairs per loop iteration (PAIR_CHUNK), not 128 — at 128 the
loop is iteration-latency-bound (~27k tiny DMAs ≈ 2 us each = the whole
kernel's 60 ms); at 1024 the same span is ~3.5k iterations of one 64 KB
DMA + up to 8 masked MXU contractions (~15 ms measured on v5e).

Precision: the MXU's default bf16 input rounding (~2^-8 relative per
pair value) matches the bf16 packing the gradient columns already ride
through the reordering sort, so this adds no error over the XLA path;
accumulation is f32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG_BLOCK = 2048     # segments per grid step
PAIR_CHUNK = 2048    # pairs streamed per loop iteration
# Round 4: both doubled from 1024 — the kernel is ITERATION-latency
# bound (total iterations ~ P/PAIR_CHUNK + num_out/SEG_BLOCK at ~3 us
# each: ~4.3k iterations = ~13 ms at bench scale); doubling both halves
# the iteration count for ~256 KB of VMEM buffers (well under 16 MB).
LANES = 128


def _segsum_kernel(c0_ref, nch_ref, rows_hbm, st_ref, en_ref, out_ref,
                   buf, sem, *, c8: int):
    b = pl.program_id(0)
    c0 = c0_ref[b]
    nch = nch_ref[b]

    def dma(slot, j):
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds((c0 + j) * PAIR_CHUNK, PAIR_CHUNK)],
            buf.at[slot], sem.at[slot])

    @pl.when(nch > 0)
    def _():
        dma(0, 0).start()

    out_ref[:, :] = jnp.zeros((c8, SEG_BLOCK), jnp.float32)
    pos_col = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, 1), 0)

    def body(j, _):
        slot = j % 2

        @pl.when(j + 1 < nch)
        def _():
            dma((j + 1) % 2, j + 1).start()

        dma(slot, j).wait()
        p0 = (c0 + j) * PAIR_CHUNK
        pos = pos_col + p0
        chunk = buf[slot]                                  # (C8, PAIR_CHUNK)
        for k in range(SEG_BLOCK // LANES):
            st_k = st_ref[k:k + 1, :]                      # (1, 128)
            en_k = en_ref[k:k + 1, :]
            # Skip segment rows whose span misses this chunk entirely
            # (a 1024-pair chunk overlaps ~2-3 of the 8 rows).
            lo = jnp.min(st_k)
            hi = jnp.max(en_k)

            @pl.when((hi > p0) & (lo < p0 + PAIR_CHUNK))
            def _():
                oh = ((st_k <= pos) & (pos < en_k)).astype(jnp.float32)
                out_ref[:, k * LANES:(k + 1) * LANES] += (
                    jax.lax.dot_general(
                        chunk, oh,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
        return 0

    jax.lax.fori_loop(0, nch, body, 0)


def _ranksum_kernel(c0_ref, nch_ref, rows_hbm, out_ref, buf, sem, *,
                    c8: int, ng: int, pair_chunk: int):
    """Rank-keyed variant: the stream's row `ng` carries each pair's
    OUTPUT INDEX (depth rank, exact small ints in f32), pairs sorted by
    that rank. No segment-bound arrays exist at all — the one-hot is an
    equality compare of the rank row against the block's rank ids, built
    transposed ((segs, pairs)) so the (1, pair_chunk) rank row needs no
    in-kernel transpose."""
    b = pl.program_id(0)
    c0 = c0_ref[b]
    nch = nch_ref[b]
    r0 = b * SEG_BLOCK

    def dma(slot, j):
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds((c0 + j) * pair_chunk, pair_chunk)],
            buf.at[slot], sem.at[slot])

    @pl.when(nch > 0)
    def _():
        dma(0, 0).start()

    out_ref[:, :] = jnp.zeros((c8, SEG_BLOCK), jnp.float32)
    seg_col = jax.lax.broadcasted_iota(jnp.int32, (LANES, 1), 0)

    def body(j, _):
        slot = j % 2

        @pl.when(j + 1 < nch)
        def _():
            dma((j + 1) % 2, j + 1).start()

        dma(slot, j).wait()
        chunk = buf[slot]                               # (C8, pair_chunk)
        rank = chunk[ng:ng + 1, :].astype(jnp.int32)    # (1, pair_chunk)
        lo = jnp.min(rank)
        hi = jnp.max(rank)
        for k in range(SEG_BLOCK // LANES):
            rk = r0 + k * LANES

            @pl.when((hi >= rk) & (lo < rk + LANES))
            def _():
                ohT = (rank == (seg_col + rk)).astype(
                    jnp.float32)                        # (128, pair_chunk)
                out_ref[:, k * LANES:(k + 1) * LANES] += (
                    jax.lax.dot_general(
                        chunk, ohT,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32))
        return 0

    jax.lax.fori_loop(0, nch, body, 0)


def rank_rowsum(rows: jax.Array, ranks: jax.Array, num_out: int,
                interpret: bool = False,
                pair_chunk: int = PAIR_CHUNK) -> jax.Array:
    """out[:, r] = sum of rows[:, p] over pairs p with ranks[p] == r.

    rows (C, P) f32 — row C-1 (== ng) MUST be `ranks` as f32; ranks (P,)
    int32 sorted ascending in [0, num_out] (num_out = discard bucket).
    Returns (C-1, num_out) f32.

    pair_chunk: pairs streamed per loop iteration. The kernel is
    iteration-latency bound (~3 us each); narrow inputs (e.g. the 1-row
    tile-histogram that replaced the per-tile-bounds searchsorted in
    ops.tiles) should pass a much larger chunk — VMEM cost is
    2 * c8 * pair_chunk * 4 bytes."""
    c, p_len = rows.shape
    ng = c - 1
    if not (interpret or jax.default_backend() == "tpu"):
        return jax.ops.segment_sum(
            rows[:ng].T, jnp.clip(ranks, 0, num_out),
            num_segments=num_out + 1)[:num_out].T

    c8 = (c + 7) // 8 * 8
    s_pad = (num_out + SEG_BLOCK - 1) // SEG_BLOCK * SEG_BLOCK
    nb = s_pad // SEG_BLOCK
    p_pad = ((p_len + pair_chunk - 1) // pair_chunk * pair_chunk
             + pair_chunk)
    # Pad pairs with rank = num_out (the discard bucket past every block).
    rows_p = jnp.pad(rows.astype(jnp.float32),
                     ((0, c8 - c), (0, p_pad - p_len)))
    rows_p = rows_p.at[ng, p_len:].set(jnp.float32(num_out))
    # Per-block pair span: ranks are sorted, so block b (ranks [r0, r0 +
    # SEG_BLOCK)) reads the contiguous pair range located by searchsorted.
    blk = jnp.arange(nb + 1, dtype=jnp.int32) * SEG_BLOCK
    bounds = jnp.searchsorted(ranks, blk, side="left").astype(jnp.int32)
    c0 = bounds[:-1] // pair_chunk
    nch = jnp.maximum(
        0, (bounds[1:] - c0 * pair_chunk + pair_chunk - 1) // pair_chunk)
    out = pl.pallas_call(
        functools.partial(_ranksum_kernel, c8=c8, ng=ng,
                          pair_chunk=pair_chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((c8, SEG_BLOCK), lambda b, *_: (0, b),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, c8, pair_chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((c8, s_pad), jnp.float32),
        interpret=interpret,
    )(c0, nch, rows_p)
    return out[:ng, :num_out]


def segment_rowsum(rows: jax.Array, starts: jax.Array, ends: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """Per-segment sums: out[:, i] = sum_{p in [starts_i, ends_i)}
    rows[:, p].

    rows (C, P) f32; starts/ends (S,) int32, contiguous non-overlapping
    ascending runs (empty segments st == en allowed, including leading/
    trailing). Returns (C, S) f32."""
    c, p_len = rows.shape
    (s,) = starts.shape
    if not (interpret or jax.default_backend() == "tpu"):
        prefix = jnp.cumsum(rows, axis=1)
        hi = jnp.where((ends > 0)[None, :],
                       prefix[:, jnp.clip(ends - 1, 0, p_len - 1)], 0.0)
        lo = jnp.where((starts > 0)[None, :],
                       prefix[:, jnp.clip(starts - 1, 0, p_len - 1)], 0.0)
        return jnp.where((ends > starts)[None, :], hi - lo, 0.0)

    c8 = (c + 7) // 8 * 8
    s_pad = (s + SEG_BLOCK - 1) // SEG_BLOCK * SEG_BLOCK
    nb = s_pad // SEG_BLOCK
    p_pad = ((p_len + PAIR_CHUNK - 1) // PAIR_CHUNK * PAIR_CHUNK
             + PAIR_CHUNK)
    rows_p = jnp.pad(rows.astype(jnp.float32),
                     ((0, c8 - c), (0, p_pad - p_len)))
    # Padded segments are empty at the end of the pair range.
    endv = jnp.full((s_pad - s,), p_len, jnp.int32)
    st_p = jnp.concatenate([jnp.clip(starts, 0, p_len), endv])
    en_p = jnp.concatenate([jnp.clip(ends, 0, p_len), endv])
    st2 = st_p.reshape(-1, LANES)
    en2 = en_p.reshape(-1, LANES)
    blk = jnp.arange(nb, dtype=jnp.int32)
    first = st_p[blk * SEG_BLOCK]
    last = en_p[blk * SEG_BLOCK + SEG_BLOCK - 1]
    c0 = first // PAIR_CHUNK
    nch = jnp.maximum(
        0, (last - c0 * PAIR_CHUNK + PAIR_CHUNK - 1) // PAIR_CHUNK)
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, c8=c8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((SEG_BLOCK // LANES, LANES),
                             lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((SEG_BLOCK // LANES, LANES),
                             lambda b, *_: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((c8, SEG_BLOCK), lambda b, *_: (0, b),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, c8, PAIR_CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((c8, s_pad), jnp.float32),
        interpret=interpret,
    )(c0, nch, rows_p, st2, en2)
    return out[:c, :s]
