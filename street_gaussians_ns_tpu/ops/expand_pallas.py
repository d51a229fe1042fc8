"""Pallas TPU ragged-expansion kernel (monotone "gather" as MXU matmul).

XLA:TPU gathers are the slowest primitive in the whole rasterization
pipeline (measured on v5e: a (3.5M, 11) row gather is ~85 ms, a plain 1D
gather of 3.5M elements from a 2M table is ~27 ms — while a 3.5M-element
multi-payload `lax.sort` is ~8 ms). The binning's two gathers have
*structure* XLA cannot see: they are ragged EXPANSIONS — each source row
repeated `count` times into a contiguous run (gaussian -> tile-row runs,
tile-row runs -> pairs). Consecutive output slots read source rows from a
bounded window, because counts are >= 1 for every live source (a visible
gaussian spans >= 1 tile row; nearly every enumerated tile row intersects
the 3-sigma ellipse), so an output block of B slots touches <= B + margin
source rows starting at a per-block base found by one small searchsorted.

The kernel turns "select source column by dynamic index" into one-hot MXU
matmuls (out = src_window_chunk @ onehot_chunk per 128-lane chunk of the
window) — the TPU idiom for gather: the 0/1 matrix is a broadcast compare
on the VPU (slot ids on sublanes, source lanes on lanes; run bounds
arrive as (8k, 128) row blocks so every layout is DMA-native), and the
matmul is exact in f32 (each output column receives exactly one 1.0
multiply).

Two MXU-shaping tricks (together ~3x over the naive loop on v5e):
  * the three bf16x3 terms are STACKED ON SUBLANES (a (3*C8, 128) lhs)
    so one matmul carries all three exactness terms — the lhs M dim goes
    from C8=16 (1/8 of the MXU's 128 rows) to 48, tripling utilization;
    the three partial products are folded after the chunk loop;
  * window chunks whose source ranges cannot overlap the output block
    (the run bounds are monotone, so the overlap band is contiguous) are
    skipped via per-block [k_lo, k_hi) bounds precomputed on the host —
    at the binning's typical ~2.2x expansion only ~half the window
    chunks overlap any given block.

Replaces the owner-mark scatter + flat cummax + row-gather scheme
(formerly ops.tiles.segment_broadcast) on the binning hot path."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EXPAND_BLOCK = 2048      # output slots per grid step (round 4: doubled
#                          from 1024 — halves the per-block fixed costs
#                          (3 DMA issues + grid bookkeeping): bench
#                          bin_and_pack 44.2 -> 42.9 ms. 4096 only gains
#                          a further ~0.8 ms while doubling the unrolled
#                          kernel size/compile time — not worth it.)
EXPAND_SUB = 256         # one-hot sub-block granularity (skip unit)
EXPAND_MARGIN = 128      # window slack for (rare) zero-count interior rows
LANES = 128


def _on_tpu(interpret: bool) -> bool:
    return interpret or jax.default_backend() == "tpu"


def _expand_kernel(base_ref, klo_ref, khi_ref, src_hbm, st_hbm, en_hbm,
                   out_ref, win, tm, acc, st_s, en_s, sems, *, block: int,
                   window: int, c8: int, e8: int):
    b = pl.program_id(0)
    # base_ref holds base/128: multiplying inside the kernel lets Mosaic
    # PROVE the dynamic DMA offsets are lane/sublane aligned.
    br = base_ref[b]
    base = br * LANES
    k_lo = klo_ref[b]
    k_hi = khi_ref[b]
    wrows = window // LANES
    # st/en row-block reads are rounded up to 8 sublanes (int32 tiling).
    wr8 = (wrows + 7) // 8 * 8
    cps = [
        pltpu.make_async_copy(src_hbm.at[:, pl.ds(base, window)], win,
                              sems.at[0]),
        pltpu.make_async_copy(st_hbm.at[pl.ds(br, wr8)], st_s, sems.at[1]),
        pltpu.make_async_copy(en_hbm.at[pl.ds(br, wr8)], en_s, sems.at[2]),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()
    s0 = b * block
    # Slot ids on SUBLANES, window sources on LANES, one 128-lane window
    # chunk at a time: every operand layout is native (no reshapes).
    sub = EXPAND_SUB
    slot_s = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
    # Manual bf16x3 source split: every f32 decomposes EXACTLY into three
    # bf16 terms (8+8+8 of the 24 mantissa bits), the one-hot operand is
    # already exact in bf16 (0.0/1.0), and each output column receives
    # exactly one 1.0 multiply per term — so native-bf16 MXU passes
    # reproduce the f32 select bit-for-bit at HALF the cycles of
    # Precision.HIGHEST's 6 passes (Mosaic has no HIGH lowering). Only the
    # first e8 rows (the caller's EXACT prefix) carry the two residual
    # terms; rows past it hold values already exactly representable in
    # bf16 (small ints, or attributes the bf16 precision mode rounded
    # upstream) and ride the first term alone — the lhs shrinks from
    # 3*c8 to c8 + 2*e8 sublanes, the dominant cost of the kernel.
    w = win[:, :]
    w1 = w.astype(jnp.bfloat16)
    tm[0:c8, :] = w1
    we = w[0:e8, :]
    r1 = we - we.astype(jnp.bfloat16).astype(jnp.float32)
    w2 = r1.astype(jnp.bfloat16)
    w3 = (r1 - w2.astype(jnp.float32)).astype(jnp.bfloat16)
    tm[c8:c8 + e8, :] = w2
    tm[c8 + e8:c8 + 2 * e8, :] = w3
    acc[:, :] = jnp.zeros((c8 + 2 * e8, block), jnp.float32)
    # Two skip levels: whole window chunks outside the block's band
    # ([k_lo, k_hi), host-precomputed), then 256-slot SUB-BLOCKS against
    # the chunk's scalar source-range bounds — at ~2.2x expansion a
    # visited chunk's sources cover only ~280 of the 1024 slots, so the
    # one-hot compares (the per-chunk cost floor once the matmuls are
    # term-stacked) run on ~1.3 sub-blocks instead of the whole block.
    for k in range(wrows):
        @pl.when((k_lo <= k) & (k < k_hi))
        def _():
            st_k = st_s[k:k + 1, :]                        # (1, 128)
            en_k = en_s[k:k + 1, :]
            lo_k = st_s[k, 0]
            hi_k = en_s[k, LANES - 1]
            sl = slice(k * LANES, (k + 1) * LANES)
            for s in range(block // sub):
                ss0 = s0 + s * sub

                @pl.when((lo_k < ss0 + sub) & (hi_k > ss0))
                def _():
                    oh = ((st_k <= slot_s + ss0)
                          & (slot_s + ss0 < en_k)).astype(
                        jnp.bfloat16)                      # (SUB, 128)
                    acc[:, s * sub:(s + 1) * sub] += jax.lax.dot_general(
                        tm[:, sl], oh,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
    out_ref[0:e8, :] = (acc[0:e8, :] + acc[c8:c8 + e8, :]
                        + acc[c8 + e8:c8 + 2 * e8, :])
    if e8 < c8:
        out_ref[e8:c8, :] = acc[e8:c8, :]


def expand_ragged(src: jax.Array, starts: jax.Array, ends: jax.Array,
                  out_len: int, interpret: bool = False,
                  n_exact: int | None = None) -> jax.Array:
    """Ragged repeat: out[:, s] = src[:, i] for the unique i with
    starts[i] <= s < ends[i].

    src (C, S) f32; starts/ends (S,) int32 with [starts_i, ends_i)
    contiguous, non-overlapping, in order (ends non-decreasing — the
    exclusive/inclusive cumsum of per-source counts). Slots covered by no
    source (beyond the total, or under a window-margin overflow from long
    zero-count runs) come out ZERO — callers treat zero rows as inert.
    Returns (C, out_len) f32.

    n_exact (default: all) = length of the prefix of rows whose values
    need full f32 exactness (bf16x3 term stacking); rows PAST it must be
    exactly representable in bf16 already (small integers, or values the
    caller rounded) and ride a single bf16 term — cutting the one-hot
    matmul lhs by up to ~1/3."""
    c, s = src.shape
    if n_exact is None:
        n_exact = c
    if not _on_tpu(interpret):
        slot = jnp.arange(out_len, dtype=jnp.int32)
        owner = jnp.clip(
            jnp.searchsorted(ends, slot, side="right"), 0, s - 1)
        hit = (starts[owner] <= slot) & (slot < ends[owner])
        return jnp.where(hit[None, :], src[:, owner], 0.0)

    block = EXPAND_BLOCK
    # Dynamic HBM offsets must be 128-lane aligned: the per-block base is
    # rounded DOWN to 128, and the window carries that slack on top of
    # the zero-count-run margin.
    window = block + EXPAND_MARGIN + LANES
    assert window % LANES == 0
    wrows = window // LANES
    wr8 = (wrows + 7) // 8 * 8
    nb = (out_len + block - 1) // block
    pad_out = nb * block
    c8 = (c + 7) // 8 * 8   # HBM slices need 8-aligned sublane extents
    e8 = min((max(n_exact, 1) + 7) // 8 * 8, c8)
    src_p = jnp.pad(src.astype(jnp.float32), ((0, c8 - c), (0, window)))
    sentinel = jnp.iinfo(jnp.int32).max
    # Run bounds as (rows, 128) lane-major blocks — the only DMA-sliceable
    # layout for a windowed 1D int read (a (n, 1) column cannot be tiled).
    n_pad = (s + window - 1) // LANES * LANES + wr8 * LANES
    st_p = jnp.pad(starts.astype(jnp.int32), (0, n_pad - s),
                   constant_values=sentinel)
    en_p = jnp.pad(ends.astype(jnp.int32), (0, n_pad - s),
                   constant_values=sentinel)
    # First source whose range can cover the block's first slot, in units
    # of 128 source rows (pre-divided so alignment is provable in-kernel).
    base = jnp.clip(
        jnp.searchsorted(
            ends, jnp.arange(nb, dtype=jnp.int32) * block, side="right"),
        0, s - 1).astype(jnp.int32)
    base = base // LANES
    # Per-(block, window-chunk) overlap band [k_lo, k_hi): chunk k's
    # sources are rows [base*128 + k*128, +128); st/en are monotone, so
    # chunks that end before the block's first slot or start at/after its
    # last are skipped inside the kernel. Sentinel-padded rows make the
    # trailing chunks' lo = INT_MAX (excluded by k_hi) while partially
    # padded chunks keep their real lo (their pad lanes one-hot to zero).
    karange = jnp.arange(wrows, dtype=jnp.int32)
    firsts = base[:, None] * LANES + karange[None, :] * LANES  # (nb, wr)
    lasts = firsts + (LANES - 1)
    lo_k = st_p[firsts]                                        # (nb, wr)
    hi_k = en_p[jnp.minimum(lasts, n_pad - 1)]
    s0 = jnp.arange(nb, dtype=jnp.int32)[:, None] * block
    k_lo = jnp.sum((hi_k <= s0).astype(jnp.int32), axis=1)
    k_hi = jnp.sum((lo_k < s0 + block).astype(jnp.int32), axis=1)
    st_p = st_p.reshape(-1, LANES)
    en_p = en_p.reshape(-1, LANES)
    out = pl.pallas_call(
        functools.partial(_expand_kernel, block=block, window=window,
                          c8=c8, e8=e8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=pl.BlockSpec((c8, block), lambda b, *_: (0, b),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((c8, window), jnp.float32),
                pltpu.VMEM((c8 + 2 * e8, window), jnp.bfloat16),
                pltpu.VMEM((c8 + 2 * e8, block), jnp.float32),
                pltpu.VMEM((wr8, LANES), jnp.int32),
                pltpu.VMEM((wr8, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((c8, pad_out), jnp.float32),
        interpret=interpret,
    )(base, k_lo, k_hi, src_p, st_p, en_p)
    return out[:c, :out_len]
