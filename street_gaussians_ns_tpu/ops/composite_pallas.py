"""Pallas TPU kernels: fused tile-sorted alpha compositing, fwd + bwd.

The production rasterizer core — the TPU replacement for gsplat's CUDA
`rasterize_gaussians` forward/backward (SURVEY.md C-N1).

Memory layout (the part that makes it a TPU kernel rather than a CUDA
translation): splat features live in HBM as (rows, 16, 128) in SORTED
pair order — row r carries 128 consecutive pairs x 16 features [x, y,
conic_a, conic_b, conic_c, opacity, color_0..C-1, pad]. Tile ranges are
not 128-aligned; both kernels stream them via dual-row DMA + dynamic
lane rotation (read side: _load_chunk; write side: the backward's `pend`
boundary carry). Invalid pairs gather a zero sentinel row and fall out
via the alpha threshold.

Compute layout: pixels on sublanes, splats on lanes — a 16x16 tile is a
(256, 128) f32 block per chunk, with the hot math pushed onto the MXU:
sigma is a tile-local polynomial contraction (constant pixel basis x
per-pair coefficients, _chunk_alpha), the sequential front-to-back
transmittance recurrence is exp(cumsum(log1p(-a))) with the lane cumsum
an upper-triangular matmul (_composite_chunk_masks), color accumulation
is a (C,128)x(256,128) contraction, and the backward's xy/conic
gradients are pixel MOMENTS of dL/dsigma (one basis^T contraction + row
algebra). The masked termination logic stays on the VPU. A `while` chunk
loop with double-buffered DMA (plus a cross-tile chunk-0 ring, see
_fwd_kernel) exits early once every pixel saturates (the CUDA kernel's
per-pixel `done` break, amortized to tile granularity).

Forward residuals: premultiplied accum (T,256,C), final transmittance
(T,256), and n_contrib (T,256) — the aligned within-tile index after the
last contributing pair, which lets the backward replay terminate
identically.

Backward: replays the forward chunk loop (recomputing alphas — cheaper
than storing (pairs, pixels) intermediates, the same trade gsplat makes),
carrying the running scalar prefix u = g.(c a T) per pixel so the suffix
term of dL/dalpha needs only 2D lane-cumsums — no back-to-front
1/(1-alpha) product chain (which overflows f32 before telescoping). Emits
per-PAIR gradients in the same (rows, 16, 128) layout; the custom_vjp
wrapper segment-sums them per gaussian. Screen-space xy gradients are
exactly what densification consumes (sgn_splatfacto.py:523).

Gradient reduce (fused path): feature row 10 carries each pair's DEPTH
RANK; the backward mirrors it into the gradient stream, so the reduce is
live-row compaction (most rows are zero after the n_contrib trim) -> one
rank-keyed sort -> rank-equality one-hot MXU contraction
(ops.segreduce_pallas.rank_rowsum) -> one un-sort to original ids. See
_reduce_pair_grads_ranked; the exp_slot machinery (_reduce_pair_grads)
remains for the unfused path.

Semantics (skip if sigma < SIGMA_MIN or alpha < 1/255 with
alpha = op*exp(-relu(sigma)); terminate BEFORE accumulating when
next_T <= 1e-4; termination latches) match ops.rasterize_ref /
ops.composite_chunked — tested against both in
tests/test_pallas_composite.py, in interpret mode and compiled.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_ref import (ALPHA_CLAMP, ALPHA_THRESH, SIGMA_MIN,
                            T_EPS)
from .tiles import TileBins

TILE = 16
PIX = TILE * TILE          # 256 pixels per tile
K = 128                    # pairs per chunk = one aligned feature row
NFEAT = 16                 # feature rows per chunk block
# Pack per-pair gradient rows as bf16 pairs for the reduction's permute
# gather (TPU only; "force" enables it off-TPU for tests). Per-gaussian
# sums stay f32; only per-pair values round (~0.4% relative).
GRAD_PACK_BF16 = True


def _tri_matmul_bf16x3(x, tri_bf16):
    """x @ tri as three bf16 MXU passes, f32 accumulate — numerically
    ~f32-matmul-grade but at the bf16 MXU rate (~8x f32 on v5e; 3 passes
    => ~2.6x net). Exact term stacking: x = hi + r1 + r2 with each term
    exactly representable in bf16, and tri's entries are 0/1 (exact), so
    every product is exact; only the f32 accumulation order differs from
    the f32 matmul. The same trick the binning expansions use
    (ops.expand_pallas). The triangular cumsum matmuls are the dominant
    MXU cost of both composite kernels (8.4 MFLOP per 128-pair chunk)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    r1 = r.astype(jnp.bfloat16)
    r2 = (r - r1.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    def mm(a):
        return jax.lax.dot_general(a, tri_bf16, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)

    return mm(hi) + (mm(r1) + mm(r2))


def _pixel_coords(t, ntx):
    """Tile t's pixel centers split into tile-LOCAL constants + origin:
    ((px_r, py_r) two (PIX, 1) f32 columns in [0.5, 15.5], (tx0, ty0)
    f32 scalars). The local columns are grid-invariant constants."""
    lp = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px_r = (lp % TILE).astype(jnp.float32) + 0.5
    py_r = (lp // TILE).astype(jnp.float32) + 0.5
    tx0 = ((t % ntx) * TILE).astype(jnp.float32)
    ty0 = ((t // ntx) * TILE).astype(jnp.float32)
    return (px_r, py_r), (tx0, ty0)


def _pixel_basis(pxy):
    """Constant (PIX, 8) pixel polynomial basis [1, px, py, px^2, px*py,
    py^2, 0, 0] in the tile frame — shared by the sigma evaluation and
    the backward's gradient moments."""
    (px_r, py_r) = pxy
    return jnp.concatenate([
        jnp.ones((PIX, 1), jnp.float32), px_r, py_r,
        px_r * px_r, px_r * py_r, py_r * py_r,
        jnp.zeros((PIX, 2), jnp.float32)], axis=1)


def _chunk_alpha(frow, pxy, txy):
    """Alphas + masks for one chunk. frow: (NFEAT, K) feature block;
    pxy/txy from _pixel_coords.

    sigma rides the MXU as a tile-local polynomial: per-pair quadratic
    coefficients in the TILE frame ((1, K) row math) contracted with the
    constant pixel basis [1, px, py, px^2, px*py, py^2] — one (PIX, 8) x
    (8, K) f32 matmul replaces the ~8 (PIX, K) VPU ops of the direct
    dx/dy form. Tile-local coordinates keep the polynomial's terms small
    (|px_r| < 16, splat offsets within the coverage ellipse), bounding
    the expansion's cancellation error ~1e-5 in sigma; the sigma <
    SIGMA_MIN dead band + relu clamp (see ops.rasterize_ref) make the
    skip rule insensitive to that formulation rounding.

    Returns (alpha (PIX,K) raw, skip (PIX,K), sigma (PIX,K)); the
    backward derives its xy/conic gradients from pixel MOMENTS of
    dL/dsigma, so no dx/dy grids are ever materialized."""
    (px_r, py_r) = pxy
    (tx0, ty0) = txy
    x = frow[0:1, :] - tx0    # (1, K) tile-frame splat centers
    y = frow[1:2, :] - ty0
    ca = frow[2:3, :]
    cb = frow[3:4, :]
    cc = frow[4:5, :]
    op = frow[5:6, :]
    ca2 = 0.5 * ca
    cc2 = 0.5 * cc
    coefs = jnp.concatenate([
        ca2 * x * x + cb * x * y + cc2 * y * y,      # 1
        -(ca * x + cb * y),                          # px
        -(cc * y + cb * x),                          # py
        ca2, cb, cc2,                                # px^2, px*py, py^2
        jnp.zeros((2, K), jnp.float32)], axis=0)     # (8, K)
    basis = _pixel_basis(pxy)                        # (PIX, 8) constant
    sigma = jax.lax.dot_general(
        basis, coefs, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (PIX, K)
    alpha = jnp.minimum(
        ALPHA_CLAMP, op * jnp.exp(-jnp.maximum(sigma, 0.0)))
    skip = (sigma < SIGMA_MIN) | (alpha < ALPHA_THRESH)
    return alpha, skip, sigma


def _composite_chunk_masks(T_in, done_in, alpha, skip):
    """gsplat-semantics masks, splats along lanes. T_in/done_in (PIX, 1).

    Returns (contributes, a_c, T_before, T_out, done_out); mirror of
    ops.composite_chunked.composite_chunk.

    One transmittance chain only: T_naive is non-increasing along lanes,
    so the terminate-before-accumulate test `T_naive <= T_EPS` latches by
    itself (no cumsum), the exclusive product is the inclusive one
    divided by (1 - a_eff) (clamped alpha <= 0.99 keeps the divisor
    >= 0.01), and the carried-out transmittance is the min of T_naive
    over contributing lanes (post-termination alphas must not deplete
    it).

    The inclusive lane product rides the MXU in log space: cumprod(om) =
    exp(cumsum(log1p(-a_eff))) with the cumsum one (PIX, K) x (K, K)
    upper-triangular f32 contraction — the 7-round roll/select/mul chain
    this replaces was ~40% of the chunk body's VPU cycles. Rounding
    differs from a sequential product by ~1e-6 relative (well inside the
    2e-5 oracle-parity tolerance; the backward replays the identical
    formula, so fwd/bwd stay self-consistent)."""
    k = alpha.shape[1]
    tri = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
           ).astype(jnp.bfloat16)
    active = (~skip) & (~jnp.broadcast_to(done_in, skip.shape))
    a_eff = jnp.where(active, alpha, 0.0)
    om = 1.0 - a_eff
    logs = jnp.log1p(-a_eff)
    cum = _tri_matmul_bf16x3(logs, tri)
    T_naive = T_in * jnp.exp(cum)
    done = T_naive <= T_EPS
    contributes = active & (~done)
    a_c = jnp.where(contributes, alpha, 0.0)
    T_before = T_naive / om
    T_out = jnp.min(jnp.where(contributes, T_naive,
                              jnp.broadcast_to(T_in, T_naive.shape)),
                    axis=1, keepdims=True)
    done_out = done_in | done[:, -1:]
    return contributes, a_c, T_before, T_out, done_out


def _load_chunk(buf, slot, phi):
    """Assemble the chunk's (NFEAT, K) feature block from the two DMA'd
    rows straddling the tile's unaligned start: lane-rotate the (NFEAT,
    2K) concatenation left by phi and keep the first K lanes. This is what
    lets the kernel stream the SORTED pair list directly — no re-packed
    aligned copy of the (pairs, feat) table in HBM."""
    combined = jnp.concatenate([buf[slot, 0], buf[slot, 1]], axis=1)
    shifted = pltpu.roll(combined, (2 * K - phi) % (2 * K), axis=1)
    return shifted[:, :K]


def _fwd_kernel(ntx_ref, starts_ref, counts_ref, feat_hbm,
                *rest, nc: int, gtiles: int = 1, with_tin: bool = False):
    if with_tin:
        tin_ref, out_ref, ring, buf, state, sem_r, sem = rest
    else:
        tin_ref = None
        out_ref, ring, buf, state, sem_r, sem = rest
    _fwd_kernel_body(ntx_ref, starts_ref, counts_ref, feat_hbm, tin_ref,
                     out_ref, ring, buf, state, sem_r, sem, nc=nc,
                     gtiles=gtiles)


def _fwd_kernel_body(ntx_ref, starts_ref, counts_ref, feat_hbm, tin_ref,
                     out_ref, ring, buf, state, sem_r,
                     sem, *, nc: int, gtiles: int = 1):
    """state: VMEM (PIX, 8) scratch — columns [T, done, ncon, pad...].
    Loop state lives in scratch refs (the while carry holds only scalars):
    Mosaic cannot unify the vreg layouts of narrow (PIX, 1) vectors carried
    through scf.while, but ref load/store round-trips are layout-free.

    MULTI-TILE grid steps (round 4): each grid step processes `gtiles`
    consecutive tiles (an unrolled python loop — the per-tile body is
    unchanged), amortizing the Mosaic per-grid-step overhead (~0.5 us per
    EMPTY tile measured by tools/bench_tile_overhead.py — grid
    bookkeeping + output-block pipelining, ~3.3 ms of the bench step per
    kernel at 6600 tiles). Callers pad the tile arrays to a multiple of
    gtiles with the end-of-pairs pad convention.

    Cross-tile ring prefetch: most tiles terminate within their first
    chunk (median n_contrib ~114 pairs at bench scale), so the per-tile
    pipeline never gets deep enough to hide the first chunk's DMA latency
    — the dominant stall is the drain at every tile boundary. Chunk 0 of
    each of the NEXT grid step's tiles is DMA'd into a 2*gtiles-slot ring
    while this step's tiles compute (the grid is sequential on a TPU
    core, so the ring is safe scratch); chunks >= 1 use the classic
    in-tile deep buffer."""
    step = pl.program_id(0)
    nt = pl.num_programs(0) * gtiles
    nring = 2 * gtiles if gtiles > 1 else 4
    ntx = ntx_ref[0]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    def ring_dma(u):
        r0 = starts_ref[u] // K
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(r0, 2)], ring.at[u % nring],
            sem_r.at[u % nring])

    # Prefetch: at step 0 start this step's AND the next step's chunk-0s;
    # afterwards each step starts the NEXT step's (ring slots are
    # double-buffered per position).
    @pl.when(step == 0)
    def _():
        # gtiles == 1 keeps the round-3 protocol: tiles 0..2 here, t+3
        # per step (tile 3 comes from step 0's second loop below).
        for g in range(3 if gtiles == 1 else gtiles):
            @pl.when((g < nt) & (counts_ref[g] > 0))
            def _():
                ring_dma(g).start()

    if gtiles == 1:
        @pl.when((step + 3 < nt) & (counts_ref[step + 3] > 0))
        def _():
            ring_dma(step + 3).start()
    else:
        for g in range(gtiles):
            u = step * gtiles + gtiles + g

            @pl.when((u < nt) & (counts_ref[u] > 0))
            def _():
                ring_dma(u).start()

    for g in range(gtiles):
        t = step * gtiles + g
        start = starts_ref[t]
        count = counts_ref[t]
        row0 = start // K
        phi = start % K
        n_chunks = pl.cdiv(count, K)
        # ntx_ref[1] = global tile id of grid step 0 (a strip offset when
        # a model shard composites a contiguous tile range; 0 otherwise).
        pxy, txy = _pixel_coords(t + ntx_ref[1], ntx)

        def dma(slot, c):
            return pltpu.make_async_copy(
                feat_hbm.at[pl.ds(row0 + c, 2)], buf.at[slot],
                sem.at[slot])

        # Deep in-tile prefetch: chunks 1..3 issue while chunk 0 (from
        # the cross-tile ring) computes — a chunk's DMA is ~free to
        # transfer but ~1 us of latency, the dominant per-chunk overhead
        # at the median ~1-4 chunks/tile (tools/bench_tile_overhead.py).
        # 4 slots (slot = c % 4): chunk c+4 reuses c's slot and is
        # started at iteration c+1, after c's wait at iteration c.
        for c0 in range(1, 4):
            @pl.when(c0 < n_chunks)
            def _():
                dma(c0 % 4, c0).start()

        # One fused (nc+2, PIX) output block per tile: rows 0..nc-1 =
        # accum, nc = final transmittance, nc+1 = n_contrib (exact small
        # ints in f32). A single out_spec means ONE pipelined output DMA
        # per grid step.
        out_ref[g, 0:nc] = jnp.zeros((nc, PIX), jnp.float32)
        if tin_ref is None:
            state[:, 0:1] = jnp.ones((PIX, 1), jnp.float32)    # T
            state[:, 1:2] = jnp.zeros((PIX, 1), jnp.float32)   # done
        else:
            # CONTINUATION mode (depth-sliced composite, round 5): the
            # transmittance chain starts from the incoming per-pixel T,
            # so accum comes out GLOBALLY premultiplied, T_out is the
            # global transmittance, and the monolithic kernel's
            # per-pixel early termination applies across slices (the
            # next_T <= T_EPS test sees the global product).
            tin = tin_ref[0, g:g + 1, :].T                     # (PIX, 1)
            state[:, 0:1] = tin
            state[:, 1:2] = (tin <= T_EPS).astype(jnp.float32)
        state[:, 2:3] = jnp.zeros((PIX, 1), jnp.float32)   # n_contrib

        def cond(carry):
            c, all_done = carry
            return (c < n_chunks) & jnp.logical_not(all_done)

        def body(carry):
            c, _ = carry
            slot = c % 4

            @pl.when((c + 3 < n_chunks) & (c > 0))
            def _():
                dma((c + 3) % 4, c + 3).start()

            @pl.when(c == 0)
            def _():
                ring_dma(t).wait()

            @pl.when(c > 0)
            def _():
                dma(slot, c).wait()

            # Chunk 0 lives in the ring slot, later chunks in the deep
            # buffer; both loads are cheap VMEM reads and the select
            # keeps the loop body branch-free.
            frow = jnp.where(c == 0, _load_chunk(ring, t % nring, phi),
                             _load_chunk(buf, slot, phi))    # (NFEAT, K)
            T = state[:, 0:1]
            done = state[:, 1:2] > 0.5
            alpha, skip, _ = _chunk_alpha(frow, pxy, txy)
            # Tail lanes past the tile's count belong to the NEXT tile.
            skip = skip | ((kcol + c * K) >= count)
            contributes, a_c, T_before, T_out, done_out = \
                _composite_chunk_masks(T, done, alpha, skip)
            w = a_c * T_before                                # (PIX, K)
            colors = frow[6:6 + nc, :]                        # (C, K)
            # Channel-row accumulation (C, PIX): HBM-crossing arrays
            # keep PIX (= 2 full lanes) as the minor dim, which Mosaic's
            # DMA requires.
            out_ref[g, 0:nc] += jax.lax.dot_general(
                colors, w, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # (C, PIX)
            pair_no = (kcol + c * K + 1).astype(jnp.float32)
            ncon = jnp.maximum(
                state[:, 2:3],
                jnp.max(jnp.where(contributes, pair_no, 0.0), axis=1,
                        keepdims=True))
            state[:, 0:1] = T_out
            state[:, 1:2] = done_out.astype(jnp.float32)
            state[:, 2:3] = ncon
            return c + 1, jnp.all(done_out)

        c_end, _ = jax.lax.while_loop(cond, body,
                                      (jnp.int32(0), jnp.bool_(False)))

        # Early exit leaves up to 3 prefetched chunk DMAs in flight;
        # drain them or their completion signals corrupt the next tile's
        # semaphore protocol. c_end == 0 can only happen when
        # n_chunks == 0 (chunk 0 always runs), so in-flight chunks here
        # are always buffer ones; the ring slot was consumed by chunk
        # 0's wait. Started chunks = {1..3} U {c+3 for executed c >= 1};
        # waited = {1..c_end-1}: the in-flight set is
        # [max(c_end,1), max(3, c_end+2)] clipped to < n_chunks.
        drain_lo = jnp.maximum(c_end, 1)
        drain_hi = jnp.minimum(jnp.maximum(3, c_end + 2), n_chunks - 1)
        for d in range(3):
            @pl.when(drain_lo + d <= drain_hi)
            def _():
                dma((drain_lo + d) % 4, drain_lo + d).wait()

        # (PIX, 1) -> (1, PIX): once per tile, outside the chunk loop.
        out_ref[g, nc:nc + 1] = state[:, 0:1].T
        out_ref[g, nc + 1:nc + 2] = state[:, 2:3].T


def _bwd_kernel(ntx_ref, starts_ref, counts_ref, nbwd_ref,
                feat_hbm, gaux_hbm, gpair_init_hbm,
                gpair_hbm, ring, buf, gbuf, pend, ga_s, state,
                sem_r, ga_sem, sem, gsem, *, nc: int,
                with_rank: bool = False, gtiles: int = 1,
                with_tin: bool = False):
    """Forward-replay backward. Per-tile inputs (DMA'd to VMEM), both in
    channel-row form so PIX stays the lane-aligned minor dim:
    g_accum (C, PIX) cotangent of premultiplied accum; aux (4, PIX) packs
    rows [g_t (cotangent of T_final), T_final, n_contrib (as f32 —
    exactly representable), gdotacc = sum_c g_accum*accum_total (the total
    prefix the suffix term needs)].

    Output: per-pair gradients in SORTED pair order — the same
    (rows, NFEAT, K) stream layout the forward reads. Tile ranges are not
    K-aligned, so each chunk's (NFEAT, K) gradient block is lane-rotated
    by phi and split across two output rows; the low part rides in the
    `pend` scratch to the next row's writer (the grid is sequential and
    sorted tile ranges are contiguous: the next tile's first partial row
    IS this tile's last). The write-side mirror of _load_chunk — no
    aligned re-pack of the gradient stream ever exists in HBM, so the
    downstream reduction needs no aligned-position indirection."""
    step = pl.program_id(0)
    nt = pl.num_programs(0) * gtiles
    nring = 2 * gtiles if gtiles > 1 else 4
    ntx = ntx_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (NFEAT, K), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    ones_p = jnp.ones((PIX, 1), jnp.float32)
    # Inclusive lane-cumsum as one (PIX,K)x(K,K) MXU contraction with an
    # upper-triangular ones matrix, run at the bf16 rate via exact term
    # stacking.
    tri = (jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
           ).astype(jnp.bfloat16)

    @pl.when(step == 0)
    def _():
        pend[:, :] = jnp.zeros((NFEAT, K), jnp.float32)

    # Cross-tile ring prefetch (see _fwd_kernel): chunk 0 and the per-
    # tile IO block (cotangents + aux) of the NEXT grid step's tiles
    # stream in while this step's tiles compute.
    def ring_dma(u):
        r0 = starts_ref[u] // K
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(r0, 2)], ring.at[u % nring],
            sem_r.at[u % nring])

    # Per-tile IO rides ONE fused (nc+4, PIX) block: rows 0..nc-1 the
    # accum cotangent, then [g_t, T_final, n_contrib, gdotacc] — one DMA
    # + one semaphore per tile instead of two.
    def ga_dma(u):
        return pltpu.make_async_copy(gaux_hbm.at[u], ga_s.at[u % nring],
                                     ga_sem.at[u % nring])

    def prefetch(u):
        ga_dma(u).start()

        @pl.when(nbwd_ref[u] > 0)
        def _():
            ring_dma(u).start()

    @pl.when(step == 0)
    def _():
        for g in range(3 if gtiles == 1 else gtiles):
            @pl.when(g < nt)
            def _():
                prefetch(g)

    if gtiles == 1:
        @pl.when(step + 3 < nt)
        def _():
            prefetch(step + 3)
    else:
        for g in range(gtiles):
            u = step * gtiles + gtiles + g

            @pl.when(u < nt)
            def _():
                prefetch(u)

    for g in range(gtiles):
        _bwd_tile(step * gtiles + g, nt, nring, ntx_ref, starts_ref,
                  counts_ref, nbwd_ref, feat_hbm, gpair_hbm, ring, buf,
                  gbuf, pend, ga_s, state, sem_r, ga_sem, sem, gsem,
                  ga_dma, ring_dma, lane, kcol, ones_p, tri, ntx,
                  nc=nc, with_rank=with_rank, with_tin=with_tin)


def _bwd_tile(t, nt, nring, ntx_ref, starts_ref, counts_ref, nbwd_ref,
              feat_hbm, gpair_hbm, ring, buf, gbuf, pend, ga_s, state,
              sem_r, ga_sem, sem, gsem, ga_dma, ring_dma, lane, kcol,
              ones_p, tri, ntx, *, nc: int, with_rank: bool,
              with_tin: bool = False):
    """One tile's backward replay (the round-3 kernel body, factored so
    _bwd_kernel can unroll `gtiles` of these per grid step)."""
    start = starts_ref[t]
    count = counts_ref[t]
    row0 = start // K
    phi = start % K
    r_end = (start + count) // K
    n_chunks = nbwd_ref[t]
    pxy, txy = _pixel_coords(t + ntx_ref[1], ntx)   # strip offset, see fwd

    def dma_in(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(row0 + c, 2)], buf.at[slot], sem.at[slot])

    # Deep in-tile prefetch (see _fwd_kernel): chunks 1..3 issue before
    # the chunk loop; 4 input slots, slot = c % 4.
    for c0 in range(1, 4):
        @pl.when(c0 < n_chunks)
        def _():
            dma_in(c0 % 4, c0).start()

    ga_dma(t).wait()
    g_accum_r = ga_s[t % nring, 0:nc, :]                      # (C, PIX)
    aux = ga_s[t % nring, nc:nc + 4, :].T                     # (PIX, 4)
    gT = aux[:, 0:1]
    tfin = aux[:, 1:2]
    ncon = aux[:, 2:3]
    gdotacc = aux[:, 3:4]

    # Loop state in scratch (see _fwd_kernel): [T, done, prefix_u].
    if with_tin:
        # Continuation replay (depth-sliced composite): the chain starts
        # from the incoming per-pixel transmittance (gaux row nc+4), so
        # T_before and the termination masks replay the GLOBAL forward
        # recurrence exactly.
        tin = ga_s[t % nring, nc + 4:nc + 5, :].T             # (PIX, 1)
        state[:, 0:1] = tin
        state[:, 1:2] = (tin <= T_EPS).astype(jnp.float32)
    else:
        state[:, 0:1] = jnp.ones((PIX, 1), jnp.float32)
        state[:, 1:2] = jnp.zeros((PIX, 1), jnp.float32)
    state[:, 2:3] = jnp.zeros((PIX, 1), jnp.float32)

    def wait_gout(slot, c):
        pltpu.make_async_copy(gbuf.at[slot], gpair_hbm.at[row0 + c],
                              gsem.at[slot]).wait()

    def cond(carry):
        c, all_done = carry
        return (c < n_chunks) & jnp.logical_not(all_done)

    def body(carry):
        c, _ = carry
        slot = c % 4        # input buffer slot (deep prefetch)
        gslot = c % 2       # gradient-out double-buffer slot

        @pl.when((c + 3 < n_chunks) & (c > 0))
        def _():
            dma_in((c + 3) % 4, c + 3).start()

        @pl.when(c == 0)
        def _():
            ring_dma(t).wait()

        @pl.when(c > 0)
        def _():
            dma_in(slot, c).wait()

        @pl.when(c >= 2)
        def _():
            wait_gout(gslot, c - 2)

        T = state[:, 0:1]
        done = state[:, 1:2] > 0.5
        prefix_u = state[:, 2:3]
        frow = jnp.where(c == 0, _load_chunk(ring, t % nring, phi),
                         _load_chunk(buf, slot, phi))
        alpha, skip, sigma = _chunk_alpha(frow, pxy, txy)
        skip = skip | ((kcol + c * K) >= count)
        within = (kcol + c * K).astype(jnp.float32) < ncon    # (PIX, K)
        contributes, a_c, T_before, T_out, done_out = \
            _composite_chunk_masks(T, done, alpha, skip)
        contributes = contributes & within
        a_c = jnp.where(contributes, alpha, 0.0)
        w = a_c * T_before                                    # (PIX, K)

        colors = frow[6:6 + nc, :]                            # (C, K)
        # g_color[c_, k] = sum_p w[p,k] g_accum[p,c_]   -> (C, K) MXU.
        g_color = jax.lax.dot_general(
            g_accum_r, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        # u = g.(c a T) per (pixel, pair); suffix gS = gdotacc - prefix - cum_u.
        gdotc = jax.lax.dot_general(                          # (PIX, K)
            g_accum_r, colors, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        u = gdotc * w
        cum_u = _tri_matmul_bf16x3(u, tri)
        gS = gdotacc - prefix_u - cum_u
        om = 1.0 - a_c
        dL_da = jnp.where(contributes,
                          gdotc * T_before - gS / om - gT * tfin / om, 0.0)
        unclamped = alpha < ALPHA_CLAMP
        dL_da = jnp.where(unclamped, dL_da, 0.0)
        # alpha = op * exp(-relu(sigma)): zero sigma-gradient inside the
        # SIGMA_MIN dead band (sigma <= 0), matching the relu clamp.
        dL_ds = jnp.where(sigma > 0.0, -alpha * dL_da, 0.0)  # (PIX, K)
        g_op_px = jnp.where(unclamped & contributes,
                            dL_da * jnp.exp(-jnp.maximum(sigma, 0.0)), 0.0)

        ca = frow[2:3, :]
        cb = frow[3:4, :]
        cc = frow[4:5, :]
        x = frow[0:1, :] - txy[0]     # tile-frame centers (see _chunk_alpha)
        y = frow[1:2, :] - txy[1]
        # Per-pair xy/conic gradients as PIXEL MOMENTS of dL/dsigma: with
        # dx = x - px, every sum over pixels of dL_ds * {dx, dy, dx^2,
        # dx*dy, dy^2} expands into the same six moments M =
        # basis^T @ dL_ds ((8, PIX) x (PIX, K), ONE MXU contraction) plus
        # (1, K) row algebra — this replaces five (PIX, K) product chains
        # + five M=1 colsum matmuls with one matmul.
        basis = _pixel_basis(pxy)
        M = jax.lax.dot_general(
            basis, dL_ds, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (8, K)
        M0, Mx, My, Mxx, Mxy, Myy = (M[0:1], M[1:2], M[2:3], M[3:4],
                                     M[4:5], M[5:6])
        Sx = x * M0 - Mx
        Sy = y * M0 - My
        Sxx = x * x * M0 - 2.0 * x * Mx + Mxx
        Syy = y * y * M0 - 2.0 * y * My + Myy
        Sxy = x * y * M0 - x * My - y * Mx + Mxy
        gx = ca * Sx + cb * Sy                                # (1, K)
        gy = cc * Sy + cb * Sx
        ga = 0.5 * Sxx
        gb = Sxy
        gc = 0.5 * Syy

        def colsum(m):                                        # (PIX,K)->(1,K)
            return jax.lax.dot_general(
                ones_p, m, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        if with_rank:
            # Row 10 mirrors the feature stream's depth-rank row so the
            # rank-keyed reduction needs no side lookup; dead lanes carry
            # zero gradients, so whatever rank they name receives +0.
            tail = ([jnp.zeros((4 - nc, K), jnp.float32)] if nc < 4
                    else [])
            tail += [frow[10:11, :],
                     jnp.zeros((NFEAT - 11, K), jnp.float32)]
        else:
            tail = [jnp.zeros((NFEAT - 6 - nc, K), jnp.float32)]
        gout = jnp.concatenate([
            gx, gy, ga, gb, gc, colsum(g_op_px), g_color] + tail, axis=0)
        # Rotate into output-row alignment and merge the carried low part.
        # Lanes past the tile's count carry zero gradients (their pairs
        # are skip-masked above), so the hold/spill stays exact.
        rotated = pltpu.roll(gout, phi, axis=1)
        row_full = jnp.where(lane >= phi, rotated, pend[:, :])

        @pl.when(row0 + c < r_end)
        def _():
            gbuf[gslot] = row_full
            pltpu.make_async_copy(gbuf.at[gslot], gpair_hbm.at[row0 + c],
                                  gsem.at[gslot]).start()
            pend[:, :] = jnp.where(lane < phi, rotated, 0.0)

        @pl.when(row0 + c >= r_end)
        def _():
            # Only the tile's final chunk can land here: its row is the
            # shared boundary row r_end — hold it for the next tile.
            pend[:, :] = row_full

        state[:, 0:1] = T_out
        state[:, 1:2] = done_out.astype(jnp.float32)
        state[:, 2:3] = prefix_u + cum_u[:, -1:]
        return c + 1, jnp.all(done_out)

    c_end, _ = jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), jnp.bool_(False)))

    # Drain the in-flight deep prefetch on early exit (see _fwd_kernel):
    # started = {1..3} U {c+3 for executed c >= 1}, waited = {1..c_end-1}.
    drain_lo = jnp.maximum(c_end, 1)
    drain_hi = jnp.minimum(jnp.maximum(3, c_end + 2), n_chunks - 1)
    for d in range(3):
        @pl.when(drain_lo + d <= drain_hi)
        def _():
            dma_in((drain_lo + d) % 4, drain_lo + d).wait()

    @pl.when(c_end >= 2)
    def _():
        wait_gout(c_end % 2, c_end - 2)

    # The final chunk only started a DMA if its row is before the tile's
    # boundary row (the hold case keeps it in `pend` instead).
    @pl.when((c_end >= 1) & (row0 + c_end - 1 < r_end))
    def _():
        wait_gout((c_end - 1) % 2, c_end - 1)

    # Early exit (c_end chunks of n_chunks, or n_chunks trimmed by
    # n_contrib) leaves pairs with zero gradients up to the tile's end:
    # rows strictly between row0+c_end and r_end stay zero via the
    # aliased zero-init; the carried partial row is flushed here and the
    # carry reset for the boundary row (its lanes are zero-grad too).
    last_row = row0 + c_end

    @pl.when(last_row < r_end)
    def _():
        gbuf[0] = pend[:, :]
        cp = pltpu.make_async_copy(gbuf.at[0], gpair_hbm.at[last_row],
                                   gsem.at[0])
        cp.start()
        cp.wait()
        pend[:, :] = jnp.zeros((NFEAT, K), jnp.float32)

    # Last tile overall (incl. grid pads, whose end-of-pairs pad starts
    # make r_end the true boundary row): flush the boundary-row carry.
    @pl.when(t == nt - 1)
    def _():
        gbuf[1] = pend[:, :]
        cp = pltpu.make_async_copy(gbuf.at[1], gpair_hbm.at[r_end],
                                   gsem.at[1])
        cp.start()
        cp.wait()


def _build_feat(xys, conics, colors, opacities, bins: TileBins):
    """Gather splat attributes into SORTED pair order and pack as
    (rows+1, NFEAT, K): row r, lane j = sorted pair r*K+j (the +1 row of
    zeros lets every tile's dual-row chunk read stay in bounds).

    Packs a per-GAUSSIAN (N, NFEAT) table first so the big per-pair gather
    reads 64-byte contiguous rows (a narrow gather of millions of rows
    from 2/3/4-wide arrays costs ~20x more HBM traffic on TPU). No
    alignment indirection: the kernels stream unaligned tile ranges via
    dual-row DMA + lane rotation (_load_chunk)."""
    nc = colors.shape[-1]
    n_pairs = bins.gauss_idx.shape[0]
    n = xys.shape[0]
    assert n_pairs % K == 0
    # Row N is an all-zero sentinel: overflow-dropped / invalid pairs
    # gather it and render as alpha 0 (saves a post-gather masking pass).
    table = jnp.concatenate([
        xys,                                         # 0:2
        conics,                                      # 2:5
        opacities[:, None],                          # 5:6
        colors.astype(jnp.float32),                  # 6:6+nc
        jnp.zeros((n, NFEAT - 6 - nc), jnp.float32),
    ], axis=-1)                                      # (N, NFEAT)
    table = jnp.concatenate([table, jnp.zeros((1, NFEAT), jnp.float32)])
    idx = jnp.where(bins.pair_valid, bins.gauss_idx, n)
    rows = table[idx]                                # (P, NFEAT)
    feat = rows.reshape(n_pairs // K, K, NFEAT).transpose(0, 2, 1)
    return jnp.concatenate(
        [feat, jnp.zeros((1, NFEAT, K), jnp.float32)], axis=0)


def _reduce_pair_grads(gpair: jax.Array, bins: TileBins,
                       num_gaussians: int, nc: int = 4,
                       interpret: bool = False) -> jax.Array:
    """Per-pair gradients (sorted pair order, (rows+1, NFEAT, K)) ->
    per-gaussian (N, NFEAT) sums, without a giant scatter-add (XLA
    scatter costs ~7.4 ns/element on v5e: a (4.45M, 16) row scatter-add
    alone would be ~500 ms). Pipeline:

      1. ONE stable multi-payload sort by expansion slot carries the 16
         gradient columns back to EXPANSION order, where every gaussian's
         pairs are contiguous (gaussian-major pair enumeration). The
         row-chunk layout slices into contiguous (max_pairs,) columns for
         free, and the sort replaces the old inverse-permutation scatter
         + two per-pair gathers at ~2.5x less wall time.
      2. exclusive-prefix cumsum (Pallas one-pass block scan) + ONE
         boundary gather = per-depth-rank sums: runs are contiguous
         (starts = exclusive cumsum), so lo_r = hi_{r-1} is a shift, not
         a second gather.
      3. rank -> original gaussian order as int32 scatter + row gather
         (5x cheaper than the (N, 16) row-scatter form).
    """
    max_pairs = bins.exp_slot.shape[0]
    ng = 6 + nc             # live gradient rows: x,y,conic(3),op,colors
    # ONE stable sort by expansion slot with the gradient columns as sort
    # PAYLOADS brings per-pair grads back to expansion order directly
    # (exp_slot values are distinct in [0, num_pairs) + sentinel
    # max_pairs tails, whose rows are zero). Payload columns through
    # lax.sort cost ~0.9 ms per operand per M pairs on v5e — the
    # argsort + (MP, 8) row gather this replaces cost ~28 ms. Only the
    # ng live rows ride; NFEAT pad rows are identically zero.
    if GRAD_PACK_BF16 and (
            jax.default_backend() == "tpu" or GRAD_PACK_BF16 == "force"):
        # Grads ride as bf16 pairs packed in int32 (ceil(ng/2) payload
        # columns instead of ng). ~0.4% relative rounding on the PER-PAIR
        # values (sums below stay f32); TPU-only, off in tests.
        np2 = (ng + 1) // 2
        u = jax.lax.bitcast_convert_type(
            gpair.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        packed = ((u[:, 0:2 * np2:2, :] << 16)
                  | u[:, 1:2 * np2:2, :]).astype(jnp.int32)
        # Unstable: exp_slot is unique on live rows; sentinel ties are
        # all-zero rows (see below) so their order is irrelevant.
        pcols = jax.lax.sort(
            (bins.exp_slot,) + tuple(packed[:, j, :].reshape(-1)[:max_pairs]
                                     for j in range(np2)),
            num_keys=1, is_stable=False)[1:]

        def unpack(j):
            col = pcols[j // 2]
            half = (col >> 16) if j % 2 == 0 else col
            return jax.lax.bitcast_convert_type(
                half.astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)

        rows_cm = jnp.stack([unpack(j) for j in range(ng)])  # (ng, MP)
    else:
        fcols = tuple(gpair[:, j, :].reshape(-1)[:max_pairs]
                      for j in range(ng))
        # Invalid/sentinel rows were never written by the kernel and stay
        # zero, so no validity masking is needed after the permute.
        rows_cm = jnp.stack(jax.lax.sort((bins.exp_slot,) + fcols,
                                         num_keys=1, is_stable=False)[1:])

    from .segreduce_pallas import segment_rowsum

    starts = jnp.clip(bins.exp_starts, 0, max_pairs)
    ends = jnp.clip(bins.exp_starts + bins.exp_counts, 0, max_pairs)
    rank_sums = segment_rowsum(rows_cm, starts, ends,
                               interpret=interpret)          # (ng, N)
    # rank -> original order: depth_order is a permutation, so sorting it
    # with the rank sums as payloads IS the inverse permutation (replaces
    # an int scatter + (N, ng) row gather at ~40% of the cost).
    out = jax.lax.sort(
        (bins.depth_order,) + tuple(rank_sums[j] for j in range(ng)),
        num_keys=1, is_stable=True)
    return jnp.stack(out[1:], axis=-1)


def _unsort_rank_sums(rank_sums, depth_order):
    """(10, N) depth-rank sums -> (N, 10) original-order gradients:
    sorting depth_order with the sums as payloads IS the inverse
    permutation (unique keys, stability irrelevant). On TPU the 10
    columns ride as 5 bf16 pairs (GRAD_PACK_BF16 policy — per-pair
    values were already bf16-rounded upstream)."""
    ng = rank_sums.shape[0]
    if GRAD_PACK_BF16 and (
            jax.default_backend() == "tpu" or GRAD_PACK_BF16 == "force"):
        from .packing import pack2, unpack2

        pk = [pack2(rank_sums[2 * j], rank_sums[2 * j + 1])
              for j in range(5)]
        out = jax.lax.sort((depth_order,) + tuple(pk), num_keys=1,
                           is_stable=False)
        cols = []
        for j in range(5):
            a, b = unpack2(out[1 + j])
            cols += [a, b]
        return jnp.stack(cols, axis=-1)
    out = jax.lax.sort(
        (depth_order,) + tuple(rank_sums[j] for j in range(ng)),
        num_keys=1, is_stable=False)
    return jnp.stack(out[1:], axis=-1)


def _reduce_pair_grads_ranked(gpair: jax.Array, starts: jax.Array,
                              nbwd: jax.Array, num_pairs: jax.Array,
                              depth_order: jax.Array, num_gaussians: int,
                              interpret: bool = False,
                              unsort: bool = True) -> jax.Array:
    """Rank-keyed gradient reduction for the fused path.

    gpair rows 0..9 are the 10 per-pair gradient columns and row 10 the
    pair's DEPTH RANK (riding the feature stream, composite_pallas
    module docstring) in (rows, NFEAT, K) sorted-pair layout. Pipeline:

      1. LIVE-ROW COMPACTION: the backward writes only rows the n_contrib
         trim visits (~25-35% at bench scale; the rest stay zero via the
         aliased zero-init). Tile row-intervals mark the live set; a
         stable flag-sort lists live rows first, and one 8 KB-row gather
         compacts them. Dead rows are identically zero (rank 0, grads 0),
         so the pad rows a short live set gathers are inert. If the live
         set overflows the static cap (low-opacity scenes with no early
         termination), a lax.cond falls back to the full-size reduce —
         same math, bigger sort.
      2. ONE sort keyed by rank (bf16-pair-packed payloads on TPU) brings
         pairs of each gaussian together (any order within a gaussian
         sums the same), replacing the old exp_slot sort + segment-bound
         machinery (exp_starts/exp_counts/searchsorted: nothing needed).
      3. rank_rowsum (ops.segreduce_pallas): rank-equality one-hot MXU
         contraction into (10, N) depth-rank sums.
      4. rank -> original order: sorting depth_order with the sums as
         payloads IS the inverse permutation.

    unsort=False (the depth-sliced backward, round 5) returns the
    (10, N) f32 rank-space sums instead of step 4's result: the caller
    sums per-slice rank sums (ranks are GLOBAL; each slice's rows
    outside its window are all-zero) and pays the full-N un-sort ONCE.
    """
    from .segreduce_pallas import rank_rowsum

    nrows = gpair.shape[0]
    ng = 10
    # Compaction-cap LADDER: the rank sort dominates the reduce and
    # lax.sort is superlinear in rows (~P^1.64, tools/bench_sort_ops.py),
    # so sorting the tightest level the live set fits is a direct win.
    # Round-4 fix: the live interval per tile includes its boundary row,
    # so n_live ~ visited rows + ~one row per tile (~58% of rows at bench
    # scale) — the old {1/3, 1/2} ladder silently fell through to the
    # FULL fallback there (28 ms instead of ~17). The denser ladder keeps
    # a level within reach of any live fraction.
    caps = []
    for num, den in ((1, 4), (3, 8), (1, 2), (5, 8), (3, 4)):
        c = max(256, (nrows * num // den + 7) // 8 * 8)
        if c < nrows and (not caps or c > caps[-1]):
            caps.append(c)
    row0 = jnp.where(nbwd > 0, starts // K, nrows)
    row1 = jnp.where(nbwd > 0, jnp.minimum(row0 + nbwd + 1, nrows), nrows)
    last_flush = jnp.minimum(num_pairs // K, nrows - 1)
    delta = jnp.zeros((nrows + 1,), jnp.int32)
    delta = delta.at[row0].add(1, mode="drop")
    delta = delta.at[row1].add(-1, mode="drop")
    delta = delta.at[last_flush].add(1, mode="drop")
    delta = delta.at[last_flush + 1].add(-1, mode="drop")
    live = jnp.cumsum(delta[:-1]) > 0
    n_live = jnp.sum(live.astype(jnp.int32))
    # order[d] = row index of the d-th live row; built by a small UNIQUE
    # set-scatter (nrows elements, ~0.1 ms) instead of a stable sort
    # (~2.4 ms): slots past n_live point at a guaranteed-DEAD (all-zero)
    # row so the compaction gather's tail stays inert. The surrounding
    # lax.cond only takes this branch when n_live <= cap < nrows, so a
    # dead row always exists.
    pos = jnp.cumsum(live.astype(jnp.int32))
    fill = jnp.argmin(live).astype(jnp.int32)     # first dead row
    order = jnp.full((nrows,), fill, jnp.int32).at[
        jnp.where(live, pos - 1, nrows)].set(
        jnp.arange(nrows, dtype=jnp.int32), mode="drop",
        unique_indices=True)

    def reduce_rows(rows3):
        p_len = rows3.shape[0] * K
        rank = rows3[:, 10, :].reshape(-1).astype(jnp.int32)
        if GRAD_PACK_BF16 and (
                jax.default_backend() == "tpu" or GRAD_PACK_BF16 == "force"):
            u = jax.lax.bitcast_convert_type(
                rows3[:, :10, :].astype(jnp.bfloat16),
                jnp.uint16).astype(jnp.uint32)
            packed = ((u[:, 0:10:2, :] << 16)
                      | u[:, 1:10:2, :]).astype(jnp.int32)
            # Stability is irrelevant: pairs of one rank are summed.
            srt = jax.lax.sort(
                (rank,) + tuple(packed[:, j, :].reshape(-1)
                                for j in range(5)),
                num_keys=1, is_stable=False)
            rank_s, pcols = srt[0], srt[1:]

            def unpack(j):
                col = pcols[j // 2]
                half = (col >> 16) if j % 2 == 0 else col
                return jax.lax.bitcast_convert_type(
                    half.astype(jnp.uint16),
                    jnp.bfloat16).astype(jnp.float32)

            rows_cm = [unpack(j) for j in range(ng)]
        else:
            srt = jax.lax.sort(
                (rank,) + tuple(rows3[:, j, :].reshape(-1)
                                for j in range(ng)),
                num_keys=1, is_stable=False)
            rank_s, rows_cm = srt[0], list(srt[1:])
        rows11 = jnp.stack(rows_cm + [rank_s.astype(jnp.float32)])
        return rank_rowsum(rows11, rank_s, num_gaussians, interpret)

    def level(i):
        """Nested conds over the cap ladder; the final else is the
        full-size (no-compaction) fallback."""
        if i == len(caps):
            return lambda g: reduce_rows(g)
        c = caps[i]
        return lambda g: jax.lax.cond(
            n_live <= c,
            lambda gg: reduce_rows(gg[order[:c]]),
            level(i + 1), g)

    rank_sums = level(0)(gpair)
    if not unsort:
        return rank_sums
    return _unsort_rank_sums(rank_sums, depth_order)


GT_FWD = 4      # tiles per forward grid step (amortizes the ~0.5 us/tile
#                 Mosaic per-step floor; tools/bench_tile_overhead.py)


def _fwd_call(feat, starts, counts, ntx, num_tiles: int, nc: int,
              interpret: bool = False, tile0=0, gtiles: int = GT_FWD,
              t_in=None):
    # Pad the tile arrays to a multiple of gtiles (end-of-pairs pad
    # starts — the uniform pad convention; fwd ignores pad starts since
    # count 0 skips all DMAs/writes except the sliced-away output rows).
    tp = -(-num_tiles // gtiles) * gtiles
    if tp != num_tiles:
        end = starts[-1] + counts[-1]
        starts = jnp.concatenate([
            starts, jnp.full((tp - num_tiles,), 1, jnp.int32) * end])
        counts = jnp.pad(counts, (0, tp - num_tiles))
        if t_in is not None:
            t_in = jnp.pad(t_in, ((0, tp - num_tiles), (0, 0)),
                           constant_values=1.0)
    nring = 2 * gtiles if gtiles > 1 else 4
    kernel = functools.partial(_fwd_kernel, nc=nc, gtiles=gtiles,
                               with_tin=t_in is not None)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    operands = [feat]
    if t_in is not None:
        # (steps, gtiles, PIX) so the block's trailing dims EQUAL the
        # array's (Mosaic's (8, 128)-divisibility rule exempts
        # whole-dimension blocks; gtiles < 8).
        in_specs.append(pl.BlockSpec((1, gtiles, PIX),
                                     lambda s, *_: (s, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(t_in.reshape(tp // gtiles, gtiles, PIX))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tp // gtiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gtiles, nc + 2, PIX),
                               lambda s, *_: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nring, 2, NFEAT, K), jnp.float32),  # chunk-0 ring
            pltpu.VMEM((4, 2, NFEAT, K), jnp.float32),      # deep buffer
            pltpu.VMEM((PIX, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((nring,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tp, nc + 2, PIX),
                                       jnp.float32),
        interpret=interpret,
    )(jnp.stack([jnp.asarray(ntx, jnp.int32),
                 jnp.asarray(tile0, jnp.int32)]), starts, counts,
      *operands)
    out = out[:num_tiles]
    # (T, C, PIX) -> (T, PIX, C) outside the kernel (free in XLA).
    return (out[:, 0:nc].transpose(0, 2, 1), out[:, nc],
            out[:, nc + 1].astype(jnp.int32))


GT_BWD = 4      # tiles per backward grid step (see GT_FWD)


def _bwd_call(feat, starts, counts, nbwd, gpair_rows: int, ntx,
              num_tiles: int, nc: int, gaux,
              interpret: bool = False, with_rank: bool = False, tile0=0,
              gtiles: int = GT_BWD, with_tin: bool = False):
    # Pad tile arrays to a multiple of gtiles. Pad starts MUST carry
    # end-of-pairs (the final boundary-row flush happens on the last PAD
    # tile at r_end = end // K — the same convention the strip pads use).
    tp = -(-num_tiles // gtiles) * gtiles
    if tp != num_tiles:
        end = starts[-1] + counts[-1]
        starts = jnp.concatenate([
            starts, jnp.full((tp - num_tiles,), 1, jnp.int32) * end])
        counts = jnp.pad(counts, (0, tp - num_tiles))
        nbwd = jnp.pad(nbwd, (0, tp - num_tiles))
        gaux = jnp.pad(gaux, ((0, tp - num_tiles), (0, 0), (0, 0)))
    nring = 2 * gtiles if gtiles > 1 else 4
    # Mosaic DMA slices need the second-to-last dim 8-aligned: pad the
    # per-tile aux block (nc+4 rows, +1 tin row in continuation mode).
    n_aux = -(-(nc + 4 + (1 if with_tin else 0)) // 8) * 8
    if gaux.shape[1] != n_aux:
        gaux = jnp.pad(gaux, ((0, 0), (0, n_aux - gaux.shape[1]), (0, 0)))
    kernel = functools.partial(_bwd_kernel, nc=nc, with_rank=with_rank,
                               gtiles=gtiles, with_tin=with_tin)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(tp // gtiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((nring, 2, NFEAT, K), jnp.float32),  # chunk-0 ring
            pltpu.VMEM((4, 2, NFEAT, K), jnp.float32),   # deep in buffer
            pltpu.VMEM((2, NFEAT, K), jnp.float32),
            pltpu.VMEM((NFEAT, K), jnp.float32),
            pltpu.VMEM((nring, n_aux, PIX), jnp.float32),   # gaux ring
            pltpu.VMEM((PIX, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((nring,)),
            pltpu.SemaphoreType.DMA((nring,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # gpair is zero-initialized by aliasing a zeros input (one HBM memset):
    # the kernel only writes visited rows, so early-exited gaps stay
    # zero without any post-hoc masking pass.
    gpair_init = jnp.zeros((gpair_rows, NFEAT, K), jnp.float32)
    gpair = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((gpair_rows, NFEAT, K), jnp.float32),
        interpret=interpret,
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.stack([jnp.asarray(ntx, jnp.int32),
                 jnp.asarray(tile0, jnp.int32)]), starts, counts, nbwd,
      feat, gaux, gpair_init)
    return gpair


def _tiles_to_image(tiles: jax.Array, ntx: int, nty: int, width: int,
                    height: int):
    """(T, PIX, C) or (T, PIX) tile layout -> (H, W, ...) image crop."""
    if tiles.ndim == 2:
        tiles = tiles[..., None]
        squeeze = True
    else:
        squeeze = False
    c = tiles.shape[-1]
    img = tiles.reshape(nty, ntx, TILE, TILE, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(nty * TILE, ntx * TILE, c)
    img = img[:height, :width]
    return img[..., 0] if squeeze else img


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def rasterize_pallas_core(xys, conics, colors, opacities, bins,
                          width: int, height: int, num_gaussians: int,
                          interpret: bool = False):
    out, _ = _rasterize_pallas_fwd(xys, conics, colors, opacities, bins,
                                   width, height, num_gaussians, interpret)
    return out


def _rasterize_pallas_fwd(xys, conics, colors, opacities, bins,
                          width, height, num_gaussians, interpret):
    ntx, nty = bins.num_tiles_x, bins.num_tiles_y
    num_tiles = ntx * nty
    nc = colors.shape[-1]
    feat = _build_feat(xys, conics, colors, opacities, bins)
    accum, tfin, ncon = _fwd_call(feat, bins.tile_start, bins.tile_count,
                                  ntx, num_tiles, nc, interpret)
    img = _tiles_to_image(accum, ntx, nty, width, height)
    alpha = 1.0 - _tiles_to_image(tfin, ntx, nty, width, height)
    residuals = (bins, feat, accum, tfin, ncon)
    return (img, alpha), residuals


def _img_to_tiles(img, c, ntx, nty, width, height):
    pad_h = nty * TILE - height
    pad_w = ntx * TILE - width
    img = jnp.pad(img.reshape(height, width, c),
                  ((0, pad_h), (0, pad_w), (0, 0)))
    return img.reshape(nty, TILE, ntx, TILE, c).transpose(
        0, 2, 1, 3, 4).reshape(ntx * nty, PIX, c)


def _bwd_from_tiles(bins, feat, accum, tfin, ncon, g_accum, g_t,
                    num_gaussians, interpret, ranked=False,
                    unsort=True, t_in=None):
    """Backward from TILE-LAYOUT cotangents (g_accum (T,PIX,C) = dL/d
    premultiplied accum, g_t (T,PIX) = dL/dT_final): kernel replay +
    pair-grad reduction. The sliced path calls this per depth slice with
    the slice's merge cotangents and unsort=False (rank-space sums);
    t_in is the slice's incoming per-pixel transmittance (continuation
    replay — see _fwd_kernel with_tin)."""
    ntx, nty = bins.num_tiles_x, bins.num_tiles_y
    num_tiles = ntx * nty
    nc = accum.shape[-1]
    max_pairs = bins.gauss_idx.shape[0]
    gdotacc = jnp.sum(g_accum * accum, axis=-1)
    aux_rows = [jnp.stack([g_t, tfin, ncon.astype(jnp.float32), gdotacc],
                          axis=1)]
    if t_in is not None:
        aux_rows.append(t_in[:, None, :])
    gaux = jnp.concatenate([g_accum.transpose(0, 2, 1)] + aux_rows,
                           axis=1)                    # (T, nc+4[+1], PIX)

    # The backward only needs chunks up to the last contributing pair
    # (everything behind it has zero gradient); n_contrib bounds that.
    nchunks_bwd = jnp.minimum(
        (bins.tile_count + K - 1) // K,
        (jnp.max(ncon, axis=1) + K - 1) // K).astype(jnp.int32)

    gpair = _bwd_call(feat, bins.tile_start, bins.tile_count,
                      nchunks_bwd, max_pairs // K + 1, ntx, num_tiles,
                      nc, gaux, interpret, with_rank=ranked,
                      with_tin=t_in is not None)

    if ranked:
        return _reduce_pair_grads_ranked(
            gpair, bins.tile_start, nchunks_bwd, bins.num_pairs,
            bins.depth_order, num_gaussians, interpret, unsort=unsort)
    return _reduce_pair_grads(gpair, bins, num_gaussians, nc, interpret)


def _rasterize_pallas_bwd(width, height, num_gaussians, interpret,
                          residuals, cotangents, ranked: bool = False):
    (bins, feat, accum, tfin, ncon) = residuals
    g_img, g_alpha = cotangents
    ntx, nty = bins.num_tiles_x, bins.num_tiles_y
    nc = accum.shape[-1]
    g_accum = _img_to_tiles(g_img, nc, ntx, nty, width, height)
    # alpha_out = 1 - T_final  =>  dL/dT_final = -g_alpha.
    g_t = -_img_to_tiles(g_alpha, 1, ntx, nty, width, height)[..., 0]
    seg = _bwd_from_tiles(bins, feat, accum, tfin, ncon, g_accum, g_t,
                          num_gaussians, interpret, ranked=ranked)
    g_xys = seg[:, 0:2]
    g_conics = seg[:, 2:5]
    g_opac = seg[:, 5]
    g_colors = seg[:, 6:6 + nc]
    return g_xys, g_conics, g_colors, g_opac, None


rasterize_pallas_core.defvjp(_rasterize_pallas_fwd, _rasterize_pallas_bwd)


def rasterize_tiles_pallas(
    xys: jax.Array,
    conics: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    bins: TileBins,
    width: int,
    height: int,
    tile_size: int,
    background: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in production compositor (same contract as
    ops.composite_chunked.rasterize_tiles_chunked, no per-tile cap)."""
    assert tile_size == TILE, "Pallas kernel is specialized to 16x16 tiles"
    img, alpha = rasterize_pallas_core(
        xys, conics, colors.astype(jnp.float32), opacities, bins,
        width, height, xys.shape[0], interpret)
    img = img + (1.0 - alpha[..., None]) * background[None, None, :]
    return img, alpha


# ---------------------------------------------------------------------------
# Fused tile-strip compositing. (The NON-fused strip path —
# rasterize_pallas_strip_core / composite_tiles_pallas — was removed in
# round 4 when the sharded scheme moved from tile strips to depth-sliced
# layer merging; git history has it if a bins-shared strip compositor is
# ever needed again.)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16, 17))
def rasterize_pallas_strip_fused_core(xys, conics, colors, opacities,
                                      depth_key, tile_box, tile0f,
                                      slice0f,
                                      width: int, height: int,
                                      n_tiles: int, max_pairs: int,
                                      max_rowruns, interpret: bool = False,
                                      last_color_is_depth: bool = False,
                                      precision: str = "f32",
                                      slice_size=None,
                                      balance_axis=None):
    """Strip variant of the FUSED bin+pack+composite: bins the scene with
    the feature columns riding the sorts (no _build_feat row gather —
    ~77 ms at bench scale), then composites only tiles [tile0, tile0 +
    n_tiles). The sharded main pass runs this per model column; the
    collective transposes sum the per-strip gradients.

    slice0f/slice_size: MODEL-SHARDED binning (ops.tiles.bin_and_pack
    depth_slice) — bin and composite only the depth-contiguous slice of
    `slice_size` gaussians starting at global depth rank slice0f (traced
    f32, device-varying under shard_map). Every pair-shaped cost then
    scales with the caller's per-device max_pairs (~1/M of the scene),
    and per-slice (accum, 1-T) layers merge EXACTLY in depth order via
    the associative over-operator (parallel.sharded._combine_layers).
    Gradients still return full-N (the threaded rank column is global).

    balance_axis (static mesh-axis name, round 5): PAIR-BALANCED windows.
    Each device trims its EQUAL-COUNT window of the (replicated) depth
    order, the per-gaussian pair counts all_gather over the axis (the
    equal windows partition the sorted order in device order, so the
    gather IS the full-N count array), and the cumsum's quantiles pick
    balanced [b_m, b_{m+1}) windows — clamped so every window fits the
    STATIC 2x-equal-split size (gaussian-shaped work stays ~2/M) while
    pair loads balance to ~1.05x mean (equal-count slicing measured
    1.68x at the bench scene's depth distribution)."""
    out, _ = _strip_fused_fwd(xys, conics, colors, opacities, depth_key,
                              tile_box, tile0f, slice0f, width, height,
                              n_tiles, max_pairs, max_rowruns, interpret,
                              last_color_is_depth, precision, slice_size,
                              balance_axis)
    return out


def _balanced_window(cols, n, sl0, slice_size, nty, interpret,
                     balance_axis):
    """Pair-balanced device window over the replicated depth order.
    Returns (anchor, static_size, (local_lo, local_hi), trim_full) —
    the device's true rank window is [anchor+local_lo, anchor+local_hi)
    inside the clamp-safe [anchor, anchor+static_size) slice."""
    from .scan_pallas import cumsum_flat
    from .tiles import _trim_full

    loc = tuple(jax.lax.dynamic_slice_in_dim(c, sl0, slice_size)
                for c in cols[:12])
    first_l, last_l, cnt_l = _trim_full(loc, TILE, nty)

    def ag(x):
        return jax.lax.all_gather(x, balance_axis, axis=0, tiled=True)

    firsts, lasts, cnts = ag(first_l), ag(last_l), ag(cnt_l)
    m_size = firsts.shape[0] // slice_size
    cnt_full = jnp.where(jnp.isfinite(cols[0]) & (cnts > 0), cnts, 0)
    cum = cumsum_flat(cnt_full, interpret=interpret)
    total = cum[-1]
    s_cap = min(2 * slice_size, n)
    # Feasibility-clamped quantile bounds, computed identically on every
    # device: monotone, window <= s_cap, and the remaining windows can
    # still cover the tail.
    bounds = [jnp.int32(0)]
    for j in range(1, m_size):
        q = jnp.searchsorted(cum, (j * total) // m_size,
                             side="left").astype(jnp.int32)
        lo = jnp.maximum(bounds[-1], n - (m_size - j) * s_cap)
        bounds.append(jnp.clip(q, lo, bounds[-1] + s_cap))
    bounds.append(jnp.int32(n))
    b = jnp.stack(bounds)
    m = sl0 // slice_size
    # dynamic_slice CLAMPS starts past n - size (XLA semantics) — anchor
    # the static window explicitly and express the device's true rank
    # window as a LOCAL [off, off+len) occupancy inside it, so a bound
    # near the tail (guaranteed at m_size=2, where s_cap == n) never
    # silently shifts the composited ranks (round-5 review finding).
    anchor = jnp.minimum(b[m], n - s_cap)
    off = b[m] - anchor
    return anchor, s_cap, (off, off + b[m + 1] - b[m]), (firsts, lasts,
                                                         cnts)


def _strip_fused_fwd(xys, conics, colors, opacities, depth_key, tile_box,
                     tile0f, slice0f, width, height, n_tiles, max_pairs,
                     max_rowruns, interpret, last_color_is_depth,
                     precision, slice_size=None, balance_axis=None):
    from .tiles import _bin_sorted, _depth_sort_cols

    ntx = (width + TILE - 1) // TILE
    nty = (height + TILE - 1) // TILE
    nc = colors.shape[-1]
    tile0 = tile0f.astype(jnp.int32)
    if max_rowruns is None:
        max_rowruns = max_pairs // 2
    cols, full_order, n = _depth_sort_cols(
        xys, conics, tile_box, depth_key, colors.astype(jnp.float32),
        opacities, ntx, nty, last_color_is_depth, precision)
    if slice_size is not None and balance_axis is not None:
        sl0 = slice0f.astype(jnp.int32)
        anchor, s_cap, local_win, trim = _balanced_window(
            cols, n, sl0, slice_size, nty, interpret, balance_axis)
        bins, feats = _bin_sorted(
            cols, full_order, n, (anchor, s_cap), width, height, TILE,
            max_pairs, max_rowruns, interpret, False, precision,
            trim=trim, local_window=local_win)
    else:
        depth_slice = (None if slice_size is None
                       else (slice0f.astype(jnp.int32), slice_size))
        bins, feats = _bin_sorted(
            cols, full_order, n, depth_slice, width, height, TILE,
            max_pairs, max_rowruns, interpret, False, precision)
    feat = _pack_feat_cols(feats, max_pairs, interpret=interpret)
    # Pad the per-tile ranges so the LAST model column's strip (whose
    # tile range may extend past the real grid when num_tiles does not
    # divide the mesh) reads empty tiles instead of clamping the slice.
    # Pad tiles MUST carry start = end-of-pairs (not 0): the backward's
    # final-tile flush writes the boundary-row gradient carry to
    # start // K, and a zero-padded tile would dump the last real tile's
    # carry onto row 0 — losing the final partial row's gradients
    # whenever its pairs contribute.
    end = bins.tile_start[-1] + bins.tile_count[-1]
    ts_pad = jnp.concatenate(
        [bins.tile_start, jnp.full((n_tiles,), 1, jnp.int32) * end])
    tc_pad = jnp.pad(bins.tile_count, (0, n_tiles))
    starts = jax.lax.dynamic_slice(ts_pad, (tile0,), (n_tiles,))
    counts = jax.lax.dynamic_slice(tc_pad, (tile0,), (n_tiles,))
    accum, tfin, ncon = _fwd_call(feat, starts, counts, ntx, n_tiles, nc,
                                  interpret, tile0=tile0)
    residuals = (bins, feat, accum, tfin, ncon, starts, counts, tile0)
    return (accum, 1.0 - tfin, bins), residuals


def _strip_fused_bwd(width, height, n_tiles, max_pairs, max_rowruns,
                     interpret, last_color_is_depth, precision,
                     slice_size, balance_axis, residuals, cotangents):
    (bins, feat, accum, tfin, ncon, starts, counts, tile0) = residuals
    ntx = (width + TILE - 1) // TILE
    num_gaussians = bins.depth_order.shape[0]
    g_accum, g_alpha, _ = cotangents
    nc = accum.shape[-1]
    g_t = -g_alpha                                       # alpha = 1 - T
    gdotacc = jnp.sum(g_accum * accum, axis=-1)
    gaux = jnp.concatenate([
        g_accum.transpose(0, 2, 1),
        jnp.stack([g_t, tfin, ncon.astype(jnp.float32), gdotacc],
                  axis=1)], axis=1)                      # (T, nc+4, PIX)
    nchunks_bwd = jnp.minimum(
        (counts + K - 1) // K,
        (jnp.max(ncon, axis=1) + K - 1) // K).astype(jnp.int32)
    gpair = _bwd_call(feat, starts, counts, nchunks_bwd, max_pairs // K + 1,
                      ntx, n_tiles, nc, gaux, interpret, with_rank=True,
                      tile0=tile0)
    # The live-row set must include the STRIP's final boundary-row flush
    # (the kernel's t==last flush lands at the strip's end row, not at
    # num_pairs // K like the full-image path).
    strip_end = starts[-1] + counts[-1]
    seg = _reduce_pair_grads_ranked(
        gpair, starts, nchunks_bwd, strip_end, bins.depth_order,
        num_gaussians, interpret)
    return (seg[:, 0:2], seg[:, 2:5], seg[:, 6:6 + nc], seg[:, 5],
            jnp.zeros((num_gaussians,), jnp.float32),
            jnp.zeros((num_gaussians, 4), jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32))


rasterize_pallas_strip_fused_core.defvjp(_strip_fused_fwd, _strip_fused_bwd)


def composite_tiles_pallas_fused(proj, colors, opacities, tile0,
                                 n_tiles: int, width: int, height: int,
                                 max_pairs: int, max_rowruns=None,
                                 interpret: bool = False,
                                 last_color_is_depth: bool = False,
                                 precision: str = "f32",
                                 slice0=0, slice_size=None,
                                 balance_axis=None):
    """Fused-binning strip compositor for the sharded main pass: same
    contract as the removed non-fused strip path (accum (n_tiles, PIX,
    C), alpha
    (n_tiles, PIX)) plus the bins, but with the feature stream riding the
    binning sorts instead of the per-pair row gather.

    slice0/slice_size select a depth-rank slice to bin+composite
    (model-sharded binning; see rasterize_pallas_strip_fused_core).
    alpha is then 1 - T_slice, the slice LAYER's opacity — merge layers
    with parallel.sharded._combine_layers."""
    depth_key = jax.lax.stop_gradient(
        jnp.where(proj.num_tiles_hit > 0, proj.depths, jnp.inf))
    accum, alpha, bins = rasterize_pallas_strip_fused_core(
        proj.xys, proj.conics, colors.astype(jnp.float32), opacities,
        depth_key, proj.tile_box.astype(jnp.float32),
        jnp.asarray(tile0, jnp.float32), jnp.asarray(slice0, jnp.float32),
        width, height, n_tiles, max_pairs, max_rowruns, interpret,
        last_color_is_depth, precision, slice_size, balance_axis)
    return accum, alpha, bins


# ---------------------------------------------------------------------------
# Fused bin + pack + composite (the production training path).
# ---------------------------------------------------------------------------

PACK_ROWS = 64      # feature rows interleaved per grid step


def _pack_kernel(*refs, n_cols: int, rows_true: int):
    (in_refs, out_ref) = refs[:-1], refs[-1]
    b = pl.program_id(0)
    r = jax.lax.broadcasted_iota(jnp.int32, (PACK_ROWS, 1, K), 0)
    live = (b * PACK_ROWS + r) < rows_true
    for c in range(NFEAT):
        if c < n_cols:
            blk = in_refs[c][...].reshape(PACK_ROWS, K)
            out_ref[:, c, :] = jnp.where(live[:, 0, :], blk, 0.0)
        else:
            out_ref[:, c, :] = jnp.zeros((PACK_ROWS, K), jnp.float32)


def _pack_feat_cols(feats, max_pairs: int, interpret: bool = False):
    """Sorted-pair feature columns -> the (rows_pad, NFEAT, K) stream the
    kernels read (rows_pad >= max_pairs//K + 1; rows past the pair
    capacity are zero — the sentinel rows tiles' dual-row reads may
    touch). Invalid pairs already hold zeros — no masking pass.

    This is a pure interleave (no math): a Pallas kernel writes each
    column's (PACK_ROWS, K) block onto its sublane of the (PACK_ROWS,
    NFEAT, K) output, with Pallas pipelining the column reads — the XLA
    stack+transpose formulation ran at ~100 GB/s (a ~4 ms step cost)."""
    assert max_pairs % K == 0
    rows_true = max_pairs // K
    n_cols = len(feats)
    # Kernel path needs whole input blocks (capacities are 128-row
    # multiples in production; odd sizes take the XLA fallback).
    if rows_true % PACK_ROWS != 0 or not (
            interpret or jax.default_backend() == "tpu"):
        cols = list(feats) + [jnp.zeros((max_pairs,), jnp.float32)
                              for _ in range(NFEAT - n_cols)]
        rows = jnp.stack(cols, axis=-1)              # (MP, NFEAT)
        feat = rows.reshape(rows_true, K, NFEAT).transpose(0, 2, 1)
        return jnp.concatenate(
            [feat, jnp.zeros((1, NFEAT, K), jnp.float32)], axis=0)
    nb = (rows_true + 1 + PACK_ROWS - 1) // PACK_ROWS
    rows_pad = nb * PACK_ROWS
    # Columns are exactly max_pairs long; the last block's tail (past the
    # pair capacity) reads block nb-2's data again via a clamped index
    # map and zeroes it in-kernel.
    blk = PACK_ROWS * K
    in_specs = [
        pl.BlockSpec((blk,),
                     lambda b: (jnp.minimum(b, rows_true // PACK_ROWS - 1),),
                     memory_space=pltpu.VMEM)
        for _ in range(n_cols)
    ]
    out = pl.pallas_call(
        functools.partial(_pack_kernel, n_cols=n_cols, rows_true=rows_true),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((PACK_ROWS, NFEAT, K), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, NFEAT, K), jnp.float32),
        interpret=interpret,
    )(*feats)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def rasterize_pallas_fused_core(xys, conics, colors, opacities,
                                depth_key, tile_box,
                                width: int, height: int, max_pairs: int,
                                max_rowruns, interpret: bool = False,
                                last_color_is_depth: bool = False,
                                precision: str = "f32"):
    """Binning + feature threading + compositing under ONE custom_vjp, so
    the payload sorts / Pallas expansions that move the differentiable
    feature columns are never autodiffed (their transpose would be the
    giant scatters this pipeline exists to avoid). The binning topology
    (pair enumeration/order) is a constant of the backward; gradients
    w.r.t. xys/conics/colors/opacities flow through the replayed
    compositor exactly as in `rasterize_pallas_core`."""
    out, _ = _fused_fwd(xys, conics, colors, opacities, depth_key,
                        tile_box, width, height, max_pairs, max_rowruns,
                        interpret, last_color_is_depth, precision)
    return out


def _fused_fwd(xys, conics, colors, opacities, depth_key, tile_box,
               width, height, max_pairs, max_rowruns, interpret,
               last_color_is_depth=False, precision="f32"):
    from .tiles import bin_and_pack

    ntx = (width + TILE - 1) // TILE
    nty = (height + TILE - 1) // TILE
    num_tiles = ntx * nty
    nc = colors.shape[-1]
    bins, feats = bin_and_pack(
        xys, conics, tile_box, depth_key, colors.astype(jnp.float32),
        opacities, width, height, TILE, max_pairs, max_rowruns,
        interpret=interpret, with_gauss_idx=False,
        last_color_is_depth=last_color_is_depth, precision=precision)
    feat = _pack_feat_cols(feats, max_pairs, interpret=interpret)
    accum, tfin, ncon = _fwd_call(feat, bins.tile_start, bins.tile_count,
                                  ntx, num_tiles, nc, interpret)
    img = _tiles_to_image(accum, ntx, nty, width, height)
    alpha = 1.0 - _tiles_to_image(tfin, ntx, nty, width, height)
    residuals = (bins, feat, accum, tfin, ncon)
    return (img, alpha, bins), residuals


def _fused_bwd(width, height, max_pairs, max_rowruns, interpret,
               last_color_is_depth, precision, residuals, cotangents):
    (bins, feat, accum, tfin, ncon) = residuals
    num_gaussians = bins.depth_order.shape[0]
    g_img, g_alpha, _ = cotangents
    g_xys, g_conics, g_colors, g_opac, _ = _rasterize_pallas_bwd(
        width, height, num_gaussians, interpret,
        (bins, feat, accum, tfin, ncon), (g_img, g_alpha), ranked=True)
    return (g_xys, g_conics, g_colors, g_opac,
            jnp.zeros((num_gaussians,), jnp.float32),
            jnp.zeros((num_gaussians, 4), jnp.float32))


rasterize_pallas_fused_core.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Single-chip depth-slice decomposition (round 5).
#
# The pair sort and the gradient reduce's rank sort are SUPERLINEAR in
# rows (~P^1.64, tools/bench_sort_ops.py), so slicing the depth-ordered
# gaussians into k contiguous rank windows and binning/compositing each
# slice separately costs k * (P/k)^1.64 ~= k^-0.64 of the monolithic
# sorts (~0.41x at k=4) while every other pair-shaped cost stays the
# same total. Because the slices partition the GLOBAL depth-rank order,
# per-slice (accum, T) layers composite exactly in depth order via the
# associative over operator (C, T) |> (C', T') = (C + T*C', T*T') — the
# same merge the model-sharded path proves exact across devices
# (parallel.sharded._combine_layers); here the slices run sequentially
# on one chip. The full-N depth sort and the final gradient un-sort are
# paid ONCE (the slice loop reuses ops.tiles._depth_sort_cols /
# _bin_sorted and concatenates rank-space gradient sums).
# ---------------------------------------------------------------------------


def _slice_caps(max_pairs, max_rowruns, n_slices):
    if max_rowruns is None:
        max_rowruns = max_pairs // 2
    mp = (-(-max_pairs // n_slices) + 8191) // 8192 * 8192
    mr = (-(-max_rowruns // n_slices) + 8191) // 8192 * 8192
    return mp, mr


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13))
def rasterize_pallas_sliced_core(xys, conics, colors, opacities,
                                 depth_key, tile_box,
                                 width: int, height: int, max_pairs: int,
                                 max_rowruns, n_slices: int,
                                 interpret: bool = False,
                                 last_color_is_depth: bool = False,
                                 precision: str = "f32"):
    """k-way depth-sliced variant of rasterize_pallas_fused_core (same
    contract; max_pairs/max_rowruns are the TOTAL budgets, split evenly
    across slices). The returned bins report num_pairs/num_rowruns as
    the CAPACITY DEMAND — n_slices x the largest slice's true count
    (>= the true total; equal when slices balance) — so the host growth
    rule keeps guaranteeing no slice ever drops pairs."""
    out, _ = _sliced_fwd(xys, conics, colors, opacities, depth_key,
                         tile_box, width, height, max_pairs, max_rowruns,
                         n_slices, interpret, last_color_is_depth,
                         precision)
    return out


def _sliced_fwd(xys, conics, colors, opacities, depth_key, tile_box,
                width, height, max_pairs, max_rowruns, n_slices,
                interpret, last_color_is_depth, precision):
    from .scan_pallas import cumsum_flat
    from .tiles import TileBins, _bin_sorted, _depth_sort_cols, _trim_full

    ntx = (width + TILE - 1) // TILE
    nty = (height + TILE - 1) // TILE
    num_tiles = ntx * nty
    nc = colors.shape[-1]
    mp_s, mr_s = _slice_caps(max_pairs, max_rowruns, n_slices)

    cols, full_order, n = _depth_sort_cols(
        xys, conics, tile_box, depth_key, colors.astype(jnp.float32),
        opacities, ntx, nty, last_color_is_depth, precision)

    # PAIR-BALANCED slice boundaries (measured: equal-COUNT depth slices
    # have ~1.7x pair imbalance at k=2 — near ranks emit far more pairs
    # per gaussian — and capacity slack is pure superlinear-sort cost).
    # Row trim runs ONCE over the full N; the per-gaussian pair counts'
    # cumsum picks boundaries at pair quantiles; each slice binds its
    # TRACED [lo, hi) rank window as a count mask over the shared
    # depth-sorted columns.
    trim = _trim_full(cols[:12], TILE, nty)
    first_f, last_f, cnt_f = trim
    cnt_full = jnp.where(jnp.isfinite(cols[0]) & (cnt_f > 0), cnt_f, 0)
    cum = cumsum_flat(cnt_full, interpret=interpret)
    total = cum[-1]
    bounds = [jnp.int32(0)]
    for s in range(1, n_slices):
        bounds.append(jnp.searchsorted(
            cum, (s * total) // n_slices, side="left").astype(jnp.int32))
    bounds.append(jnp.int32(n))

    # CONTINUATION compositing: slice s starts its transmittance chain
    # from the previous slice's per-pixel T (the kernels' with_tin mode),
    # so (a) accum comes out globally premultiplied (the merge is a plain
    # sum), and (b) the monolithic kernel's per-pixel early termination
    # applies ACROSS slices — without it, each slice composites from
    # T=1 and the back slices redo work the merge multiplies by ~0
    # (measured fwd 13->27 ms, bwd 22->47 ms at k=2 on the bench scene).
    # Tiles with every pixel terminated additionally drop their counts
    # entirely (no chunk DMAs, matching the monolithic loop exit).
    c_agg = jnp.zeros((num_tiles, PIX, nc), jnp.float32)
    t_prev = None
    per_slice = []
    tile_count_true = None
    for s in range(n_slices):
        bins_s, feats_s = _bin_sorted(
            cols, full_order, n, None, width, height, TILE,
            mp_s, mr_s, interpret, False, precision,
            rank_window=(bounds[s], bounds[s + 1]), trim=trim)
        # True binned counts BEFORE termination gating: the public
        # max_tile_count metric must report the scene's densest tile
        # (it drives the portable-path truncation warning), not the
        # post-termination workload.
        tile_count_true = (bins_s.tile_count if tile_count_true is None
                          else tile_count_true + bins_s.tile_count)
        if s > 0:
            t_done = jnp.max(t_prev, axis=1) <= T_EPS
            bins_s = dataclasses.replace(
                bins_s,
                tile_count=jnp.where(t_done, 0, bins_s.tile_count))
        feat_s = _pack_feat_cols(feats_s, mp_s, interpret=interpret)
        accum_s, tfin_s, ncon_s = _fwd_call(
            feat_s, bins_s.tile_start, bins_s.tile_count, ntx, num_tiles,
            nc, interpret, t_in=t_prev)
        c_agg = c_agg + accum_s
        per_slice.append((bins_s, feat_s, accum_s, tfin_s, ncon_s))
        t_prev = tfin_s

    img = _tiles_to_image(c_agg, ntx, nty, width, height)
    alpha = 1.0 - _tiles_to_image(t_prev, ntx, nty, width, height)

    b0 = per_slice[0][0]
    demand_p = n_slices * jnp.max(
        jnp.stack([ps[0].num_pairs for ps in per_slice]))
    demand_r = n_slices * jnp.max(
        jnp.stack([ps[0].num_rowruns for ps in per_slice]))
    bins_pub = TileBins(
        gauss_idx=b0.gauss_idx, pair_valid=b0.pair_valid,
        tile_start=b0.tile_start, tile_count=tile_count_true,
        num_pairs=demand_p, num_rowruns=demand_r,
        exp_slot=b0.exp_slot, depth_order=full_order,
        exp_starts=b0.exp_starts, exp_counts=b0.exp_counts,
        num_tiles_x=ntx, num_tiles_y=nty)
    residuals = (tuple(per_slice), full_order, n)
    return (img, alpha, bins_pub), residuals


def _sliced_bwd(width, height, max_pairs, max_rowruns, n_slices,
                interpret, last_color_is_depth, precision, residuals,
                cotangents):
    per_slice, full_order, n = residuals
    g_img, g_alpha, _ = cotangents
    b0 = per_slice[0][0]
    ntx, nty = b0.num_tiles_x, b0.num_tiles_y
    nc = per_slice[0][2].shape[-1]
    g_c = _img_to_tiles(g_img, nc, ntx, nty, width, height)
    g_t_total = -_img_to_tiles(g_alpha, 1, ntx, nty, width, height)[..., 0]

    k = len(per_slice)
    # Continuation-mode cotangents. The composite is a sequential chain:
    # slice s maps (T_in_s, stream_s) -> (accum_s, T_out_s) with
    # T_in_{s+1} = T_out_s, C = sum_s accum_s, alpha = 1 - T_out_{k-1}.
    # dL/daccum_s = g_C for every slice; dL/dT_out chains BACKWARD
    # through each slice's linearity in its T_in (given the latched
    # termination topology, accum_s and T_out_s are exactly
    # t_in * their unit-layer values):
    #   dL/dT_in_s = (<g_C, accum_s> + g_T_out_s * T_out_s) / T_in_s
    # with pass-through (= g_T_out_s) where T_in_s <= T_EPS (the slice
    # added nothing and T_out = T_in there).
    #
    # Slice rank windows are TRACED (pair-balanced boundaries), so each
    # slice reduces into the full-N rank space (ranks are global; out-of-
    # window rows contribute exact zeros) and the k sums ADD; the rank
    # sort inside each reduce still runs at ~1/k rows — the superlinear
    # win — and the full-N un-sort is paid once.
    rank_sums = None
    g_t = g_t_total
    for s in range(k - 1, -1, -1):
        bins_s, feat_s, accum_s, tfin_s, ncon_s = per_slice[s]
        t_in_s = per_slice[s - 1][3] if s > 0 else None
        rs = _bwd_from_tiles(
            bins_s, feat_s, accum_s, tfin_s, ncon_s, g_c, g_t,
            n, interpret, ranked=True, unsort=False, t_in=t_in_s)
        rank_sums = rs if rank_sums is None else rank_sums + rs
        if s > 0:
            gdota = jnp.sum(g_c * accum_s, axis=-1)
            g_t = jnp.where(t_in_s > T_EPS,
                            (gdota + g_t * tfin_s)
                            / jnp.maximum(t_in_s, T_EPS), g_t)
    seg = _unsort_rank_sums(rank_sums, full_order)
    return (seg[:, 0:2], seg[:, 2:5], seg[:, 6:6 + nc], seg[:, 5],
            jnp.zeros((n,), jnp.float32), jnp.zeros((n, 4), jnp.float32))


rasterize_pallas_sliced_core.defvjp(_sliced_fwd, _sliced_bwd)


def rasterize_tiles_pallas_fused(
    proj,
    colors: jax.Array,
    opacities: jax.Array,
    width: int,
    height: int,
    tile_size: int,
    background: jax.Array,
    max_pairs: int,
    max_rowruns=None,
    interpret: bool = False,
    last_color_is_depth: bool = False,
    precision: str = "f32",
    depth_slices: int = 1,
):
    """Production bin+composite: returns (img, alpha, bins).

    depth_slices > 1 runs the single-chip depth-slice decomposition
    (k sequential rank windows, exact over-operator layer merge) — same
    outputs, superlinearly cheaper pair/rank sorts."""
    assert tile_size == TILE, "Pallas kernel is specialized to 16x16 tiles"
    depth_key = jax.lax.stop_gradient(
        jnp.where(proj.num_tiles_hit > 0, proj.depths, jnp.inf))
    # tile_box rides as f32 (exact small ints) so its zero cotangent is
    # dtype-legal; bin_and_pack re-casts to int32.
    if depth_slices > 1:
        img, alpha, bins = rasterize_pallas_sliced_core(
            proj.xys, proj.conics, colors.astype(jnp.float32), opacities,
            depth_key, proj.tile_box.astype(jnp.float32), width, height,
            max_pairs, max_rowruns, depth_slices, interpret,
            last_color_is_depth, precision)
    else:
        img, alpha, bins = rasterize_pallas_fused_core(
            proj.xys, proj.conics, colors.astype(jnp.float32), opacities,
            depth_key, proj.tile_box.astype(jnp.float32), width, height,
            max_pairs, max_rowruns, interpret, last_color_is_depth,
            precision)
    img = img + (1.0 - alpha[..., None]) * background[None, None, :]
    return img, alpha, bins
