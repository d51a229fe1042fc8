"""Pallas TPU kernels: fused tile-sorted alpha compositing, fwd + bwd.

The production rasterizer core — the TPU replacement for gsplat's CUDA
`rasterize_gaussians` forward/backward (SURVEY.md C-N1). Everything heavy
about 3DGS compositing is here:

Forward (per 16x16 tile, grid over tiles):
  * the tile's depth-sorted (gaussian, tile) pair slice lives in HBM as a
    pre-gathered (num_pairs, 16) feature table [x, y, conic_a, conic_b,
    conic_c, opacity, color_0..C-1, pad]; chunks of K pairs are DMA'd into
    a double-buffered VMEM scratch so the next chunk's fetch overlaps the
    current chunk's math,
  * alphas for the whole chunk are computed as one (K, 256) VPU block; the
    sequential front-to-back transmittance recurrence is vectorized as a
    cumulative product along K (alphas are clamped at 0.999 so 1-alpha is
    well-conditioned); gsplat's skip (sigma<0, alpha<1/255) and
    early-termination (next_T <= 1e-4 kills the splat AND everything
    behind it) semantics are reproduced exactly with masks — see
    ops.composite_chunked.composite_chunk, the jnp template this mirrors,
  * per-chunk color accumulation is a (256, K) x (K, C) MXU contraction,
  * a chunk loop `while` exits early once every pixel in the tile is
    saturated (the CUDA kernel's per-pixel `done` break, amortized to
    tile granularity),
  * outputs: premultiplied color accum (T, 256, C), final transmittance
    (T, 256), and n_contrib (T, 256) — the within-tile index after the
    last contributing pair, the residual that lets the backward replay
    terminate identically.

Backward (same tiling): replays the forward chunk loop (recomputing alphas
— cheaper than storing (pairs, pixels) intermediates, same trade gsplat
makes), maintaining the running prefix accumulation so the suffix
S_k = accum_total - prefix_k gives dL/dalpha without the back-to-front
1/(1-alpha) product chain (which can overflow f32 before it telescopes).
Emits per-PAIR gradients [gx, gy, ga, gb, gc, g_op, g_color...]; the
custom_vjp wrapper segment-sums them per gaussian. Screen-space xy
gradients are exactly what densification consumes (sgn_splatfacto.py:523).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_ref import ALPHA_CLAMP, ALPHA_THRESH, T_EPS
from .tiles import TileBins

TILE = 16
PIX = TILE * TILE          # 256 pixels per tile
K = 64                     # pairs per chunk
NFEAT = 16                 # feature row width (padded for lane alignment)


def _pixel_coords(t, ntx):
    """Pixel-center coordinates of tile t: two (1, PIX) f32 rows."""
    lp = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    tx0 = (t % ntx) * TILE
    ty0 = (t // ntx) * TILE
    px = tx0.astype(jnp.float32) + (lp % TILE).astype(jnp.float32) + 0.5
    py = ty0.astype(jnp.float32) + (lp // TILE).astype(jnp.float32) + 0.5
    return px, py


def _chunk_alpha(feat, px, py, valid_k):
    """Alphas + skip masks for one chunk. feat: (K, NFEAT) VMEM block.

    Returns (alpha_raw (K,PIX), skip (K,PIX), clamped eff alpha handled by
    caller via composite math).
    """
    x = feat[:, 0:1]
    y = feat[:, 1:2]
    ca = feat[:, 2:3]
    cb = feat[:, 3:4]
    cc = feat[:, 4:5]
    op = feat[:, 5:6]
    dx = x - px                                  # (K, PIX)
    dy = y - py
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    alpha = jnp.minimum(ALPHA_CLAMP, op * jnp.exp(-sigma))
    skip = (sigma < 0.0) | (alpha < ALPHA_THRESH) | (~valid_k)
    return alpha, skip, (dx, dy, sigma)


def _composite_chunk_masks(T_in, done_in, alpha, skip):
    """The chunked gsplat-semantics compositing masks (mirror of
    ops.composite_chunked.composite_chunk). All (K, PIX) except T_in/done_in
    (1, PIX). Returns (contributes, T_before, T_out, done_out)."""
    active = (~skip) & (~jnp.broadcast_to(done_in, skip.shape))
    a_eff = jnp.where(active, alpha, 0.0)
    T_naive = T_in * jnp.cumprod(1.0 - a_eff, axis=0)
    term = active & (T_naive <= T_EPS)
    done = jnp.cumsum(term.astype(jnp.int32), axis=0) > 0
    contributes = active & (~done)
    a_c = jnp.where(contributes, alpha, 0.0)
    om = 1.0 - a_c
    cum_incl = jnp.cumprod(om, axis=0)
    T_before = T_in * (cum_incl / om)            # exclusive cumprod
    T_out = T_in * cum_incl[-1:, :]
    done_out = done_in | done[-1:, :]
    return contributes, a_c, T_before, T_out, done_out


def _fwd_kernel(ntx_ref, starts_ref, counts_ref, feat_hbm,
                accum_ref, tfin_ref, ncon_ref, buf, sem, *, nc: int):
    t = pl.program_id(0)
    ntx = ntx_ref[0]
    start = starts_ref[t]
    count = counts_ref[t]
    px, py = _pixel_coords(t, ntx)
    n_chunks = pl.cdiv(count, K)

    def dma(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(start + c * K, K), :], buf.at[slot],
            sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    kidx = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

    def cond(carry):
        c, T, done, accum, ncon = carry
        return (c < n_chunks) & jnp.logical_not(jnp.all(done))

    def body(carry):
        c, T, done, accum, ncon = carry
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            dma((c + 1) % 2, c + 1).start()

        dma(slot, c).wait()
        feat = buf[slot]
        valid_k = (kidx + c * K) < count
        alpha, skip, _ = _chunk_alpha(feat, px, py, valid_k)
        contributes, a_c, T_before, T_out, done_out = _composite_chunk_masks(
            T, done, alpha, skip)
        w = a_c * T_before                                    # (K, PIX)
        colors = feat[:, 6:6 + nc]                            # (K, C)
        accum = accum + jax.lax.dot_general(
            w, colors, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (PIX, C)
        pair_no = (kidx + c * K + 1).astype(jnp.float32)
        ncon = jnp.maximum(
            ncon,
            jnp.max(jnp.where(contributes, pair_no, 0.0), axis=0,
                    keepdims=True))
        return c + 1, T_out, done_out, accum, ncon

    T0 = jnp.ones((1, PIX), jnp.float32)
    done0 = jnp.zeros((1, PIX), jnp.bool_)
    accum0 = jnp.zeros((PIX, nc), jnp.float32)
    ncon0 = jnp.zeros((1, PIX), jnp.float32)
    _, T, _, accum, ncon = jax.lax.while_loop(
        cond, body, (jnp.int32(0), T0, done0, accum0, ncon0))

    accum_ref[0, :, :] = accum
    tfin_ref[0, :, :] = T
    ncon_ref[0, :, :] = ncon.astype(jnp.int32)


def _bwd_kernel(ntx_ref, starts_ref, counts_ref, feat_hbm,
                g_accum_hbm, g_t_hbm, tfin_hbm, ncon_hbm, accum_hbm,
                gpair_hbm, buf, gbuf, sem, gsem, iosem, *, nc: int):
    """Per-tile backward: forward replay emitting per-pair grads.

    g_accum: dL/d(premultiplied accum) (T, PIX, C); g_t: dL/dT_final
    (T, PIX) (callers fold background and alpha-output grads into it).
    """
    t = pl.program_id(0)
    ntx = ntx_ref[0]
    start = starts_ref[t]
    count = counts_ref[t]
    px, py = _pixel_coords(t, ntx)
    n_chunks = pl.cdiv(count, K)

    def dma_in(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(start + c * K, K), :], buf.at[slot],
            sem.at[slot])

    def run(tile_io):
        g_accum, g_t, tfin, ncon, accum_tot = tile_io

        @pl.when(n_chunks > 0)
        def _():
            dma_in(0, 0).start()

        kidx = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        # dL/dT_final reaches every contributing splat through T_final =
        # prod(1-alpha): d T_final/d alpha_k = -T_final/(1-alpha_k).
        gT = g_t                                              # (1, PIX)

        def cond(carry):
            c, T, done, prefix = carry
            return (c < n_chunks) & jnp.logical_not(jnp.all(done))

        def body(carry):
            c, T, done, prefix = carry
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                dma_in((c + 1) % 2, c + 1).start()

            dma_in(slot, c).wait()
            # Make sure the previous grad write-out from this slot is done.
            @pl.when(c >= 2)
            def _():
                pltpu.make_async_copy(
                    gbuf.at[slot], gpair_hbm.at[pl.ds(start + (c - 2) * K, K), :],
                    gsem.at[slot]).wait()

            feat = buf[slot]
            valid_k = (kidx + c * K) < count
            alpha, skip, (dx, dy, sigma) = _chunk_alpha(feat, px, py, valid_k)
            # Forward's exact contribution set, via the n_contrib residual.
            within = (kidx + c * K) < ncon                    # (K, PIX)
            contributes, a_c, T_before, T_out, done_out = \
                _composite_chunk_masks(T, done, alpha, skip)
            contributes = contributes & within
            a_c = jnp.where(contributes, alpha, 0.0)
            w = a_c * T_before                                # (K, PIX)

            colors = feat[:, 6:6 + nc]                        # (K, C)
            # g_color[k, :] = sum_p w[k,p] g_accum[p, :]  -> (K, C) MXU.
            g_color = jax.lax.dot_general(
                w, g_accum, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            # dL/dalpha_k = g . (c_k T_before_k - S_k/(1-a_k))
            #              - gT * T_final/(1-a_k)
            # with S_k = accum_total - prefix_incl_k (suffix sum behind k).
            contrib_c = w[:, :, None] * colors[:, None, :]    # (K, PIX, C)
            prefix_incl = prefix[None] + jnp.cumsum(contrib_c, axis=0)
            S = accum_tot[None] - prefix_incl                 # (K, PIX, C)
            g_dot_c = jax.lax.dot_general(                    # (K, PIX)
                colors, g_accum,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            gS = jnp.sum(S * g_accum[None], axis=-1)          # (K, PIX)
            om = 1.0 - a_c
            dL_da = jnp.where(
                contributes,
                g_dot_c * T_before - gS / om - gT * tfin / om,
                0.0)
            # alpha = op*exp(-sigma), clamped: grads stop where clamp binds.
            unclamped = alpha < ALPHA_CLAMP
            dL_da = jnp.where(unclamped, dL_da, 0.0)
            dL_dsigma = -alpha * dL_da                        # (K, PIX)
            op = feat[:, 5:6]
            g_op_px = jnp.where(unclamped & contributes,
                                dL_da * jnp.exp(-sigma), 0.0)

            ca = feat[:, 2:3]
            cb = feat[:, 3:4]
            cc = feat[:, 4:5]
            # dsigma/ddx = ca*dx + cb*dy ; ddx/dx_splat = +1.
            gx_px = dL_dsigma * (ca * dx + cb * dy)
            gy_px = dL_dsigma * (cc * dy + cb * dx)
            ga_px = dL_dsigma * 0.5 * dx * dx
            gb_px = dL_dsigma * dx * dy
            gc_px = dL_dsigma * 0.5 * dy * dy

            ones = jnp.ones((PIX, 1), jnp.float32)

            def rowsum(m):                                    # (K, PIX) -> (K, 1)
                return jax.lax.dot_general(
                    m, ones, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            gout = jnp.concatenate([
                rowsum(gx_px), rowsum(gy_px), rowsum(ga_px), rowsum(gb_px),
                rowsum(gc_px), rowsum(g_op_px), g_color,
                jnp.zeros((K, NFEAT - 6 - nc), jnp.float32)], axis=1)
            gbuf[slot] = gout
            pltpu.make_async_copy(
                gbuf.at[slot], gpair_hbm.at[pl.ds(start + c * K, K), :],
                gsem.at[slot]).start()

            prefix = prefix + jnp.sum(contrib_c, axis=0)      # (PIX, C)
            return c + 1, T_out, done_out, prefix

        T0 = jnp.ones((1, PIX), jnp.float32)
        done0 = jnp.zeros((1, PIX), jnp.bool_)
        prefix0 = jnp.zeros((PIX, nc), jnp.float32)
        c_end, _, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), T0, done0, prefix0))

        # Drain outstanding grad writes.
        @pl.when(c_end >= 2)
        def _():
            pltpu.make_async_copy(
                gbuf.at[(c_end - 2) % 2],
                gpair_hbm.at[pl.ds(start + (c_end - 2) * K, K), :],
                gsem.at[(c_end - 2) % 2]).wait()

        @pl.when(c_end >= 1)
        def _():
            pltpu.make_async_copy(
                gbuf.at[(c_end - 1) % 2],
                gpair_hbm.at[pl.ds(start + (c_end - 1) * K, K), :],
                gsem.at[(c_end - 1) % 2]).wait()

        # Zero grads for this tile's pairs past the early-exit point.
        def zero_tail(c, _):
            @pl.when(c >= c_end)
            def _():
                gbuf[0] = jnp.zeros((K, NFEAT), jnp.float32)
                cp = pltpu.make_async_copy(
                    gbuf.at[0], gpair_hbm.at[pl.ds(start + c * K, K), :],
                    gsem.at[0])
                cp.start()
                cp.wait()
            return ()

        jax.lax.fori_loop(0, n_chunks, zero_tail, (), unroll=False)

    def load_tile_io(scratch, iosems):
        g_accum_s, g_t_s, tfin_s, ncon_s, accum_s = scratch
        cps = [
            pltpu.make_async_copy(g_accum_hbm.at[t], g_accum_s, iosems.at[0]),
            pltpu.make_async_copy(g_t_hbm.at[t], g_t_s, iosems.at[1]),
            pltpu.make_async_copy(tfin_hbm.at[t], tfin_s, iosems.at[2]),
            pltpu.make_async_copy(ncon_hbm.at[t], ncon_s, iosems.at[3]),
            pltpu.make_async_copy(accum_hbm.at[t], accum_s, iosems.at[4]),
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        run((g_accum_s[:, :], g_t_s[:, :], tfin_s[:, :],
             ncon_s[:, :], accum_s[:, :]))

    pl.run_scoped(
        lambda g_accum_s, g_t_s, tfin_s, ncon_s, accum_s, iosems: load_tile_io(
            (g_accum_s, g_t_s, tfin_s, ncon_s, accum_s), iosems),
        pltpu.VMEM((PIX, nc), jnp.float32),
        pltpu.VMEM((1, PIX), jnp.float32),
        pltpu.VMEM((1, PIX), jnp.float32),
        pltpu.VMEM((1, PIX), jnp.int32),
        pltpu.VMEM((PIX, nc), jnp.float32),
        pltpu.SemaphoreType.DMA((5,)),
    )


def _build_feat(xys, conics, colors, opacities, bins: TileBins):
    """Gather splat attributes into sorted-pair order: (num_pairs_pad, 16).
    XLA gather — one HBM pass, fused with the packing."""
    nc = colors.shape[-1]
    g = bins.gauss_idx
    feat = jnp.zeros((g.shape[0] + K, NFEAT), jnp.float32)
    ok = bins.pair_valid
    rows = jnp.concatenate([
        xys[g],                                  # 0:2
        conics[g],                               # 2:5
        jnp.where(ok, opacities[g], 0.0)[:, None],  # 5:6 (invalid -> alpha 0)
        colors[g].astype(jnp.float32),           # 6:6+nc
        jnp.zeros((g.shape[0], NFEAT - 6 - nc), jnp.float32),
    ], axis=-1)
    return feat.at[:g.shape[0]].set(rows)


def _tile_io_shapes(num_tiles: int, nc: int):
    return (
        jax.ShapeDtypeStruct((num_tiles, PIX, nc), jnp.float32),
        jax.ShapeDtypeStruct((num_tiles, 1, PIX), jnp.float32),
        jax.ShapeDtypeStruct((num_tiles, 1, PIX), jnp.int32),
    )


def _fwd_call(feat, starts, counts, ntx, num_tiles: int, nc: int,
              interpret: bool = False):
    kernel = functools.partial(_fwd_kernel, nc=nc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, PIX, nc), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, K, NFEAT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    accum, tfin, ncon = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=_tile_io_shapes(num_tiles, nc),
        interpret=interpret,
    )(jnp.asarray([ntx], jnp.int32), starts, counts, feat)
    return accum, tfin[:, 0, :], ncon[:, 0, :]


def _bwd_call(feat, starts, counts, ntx, num_tiles: int, nc: int,
              g_accum, g_t, tfin, ncon, accum, interpret: bool = False):
    kernel = functools.partial(_bwd_kernel, nc=nc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, K, NFEAT), jnp.float32),
            pltpu.VMEM((2, K, NFEAT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    gpair = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(feat.shape, jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray([ntx], jnp.int32), starts, counts, feat,
      g_accum, g_t.reshape(num_tiles, 1, PIX), tfin.reshape(num_tiles, 1, PIX),
      ncon.reshape(num_tiles, 1, PIX), accum)
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
    residuals = (xys, conics, colors, opacities, bins, feat, accum, tfin,
                 ncon)
    return (img, alpha), residuals


def _rasterize_pallas_bwd(width, height, num_gaussians, interpret,
                          residuals, cotangents):
    xys, conics, colors, opacities, bins, feat, accum, tfin, ncon = residuals
    g_img, g_alpha = cotangents
    ntx, nty = bins.num_tiles_x, bins.num_tiles_y
    num_tiles = ntx * nty
    nc = colors.shape[-1]

    # Image-space cotangents -> padded tile layout.
    def to_tiles(img, c):
        pad_h = nty * TILE - height
        pad_w = ntx * TILE - width
        img = jnp.pad(img.reshape(height, width, c),
                      ((0, pad_h), (0, pad_w), (0, 0)))
        return img.reshape(nty, TILE, ntx, TILE, c).transpose(
            0, 2, 1, 3, 4).reshape(num_tiles, PIX, c)

    g_accum = to_tiles(g_img, nc)
    # alpha_out = 1 - T_final  =>  dL/dT_final = -g_alpha.
    g_t = -to_tiles(g_alpha, 1)[..., 0]

    gpair = _bwd_call(feat, bins.tile_start, bins.tile_count, ntx, num_tiles,
                      nc, g_accum, g_t, tfin, ncon, accum, interpret)
    gpair = gpair[:bins.gauss_idx.shape[0]]
    gpair = jnp.where(bins.pair_valid[:, None], gpair, 0.0)

    seg = jax.ops.segment_sum(gpair, bins.gauss_idx,
                              num_segments=num_gaussians)
    g_xys = seg[:, 0:2]
    g_conics = seg[:, 2:5]
    g_opac = seg[:, 5]
    g_colors = seg[:, 6:6 + nc].astype(colors.dtype)
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
