"""Chunk-vectorized tile compositing — the TPU-shaped algorithm.

Front-to-back alpha compositing is sequential per pixel, which maps badly
onto a vector machine if done one splat at a time (ops.composite_jnp's scan
carries (tiles, pixels) state through max_per_tile steps). The TPU-native
formulation processes splats in chunks of K:

  * compute the (K, pixels) alpha matrix for the chunk (VPU elementwise),
  * turn the sequential transmittance recurrence into a cumulative product
    along K (log-free cumprod; alphas are capped at 0.999 so 1-alpha >= 1e-3),
  * reproduce gsplat's early-termination semantics exactly with masks:
    a splat TERMINATES (contributes nothing, freezes T) when it would push
    T <= 1e-4, and everything behind it is dead (see ops.rasterize_ref),
  * accumulate color via an einsum contraction (pixels, K) x (K, C) — MXU.

Across chunks only a (pixels,) transmittance carry survives, so the scan
depth drops by K and the per-step work is a matmul instead of an FMA.

This file is pure jnp: it is the portable production path (CPU tests,
any-backend fallback) and the numeric template the Pallas kernel in
ops.composite_pallas mirrors chunk-for-chunk.

Semantics match gsplat v0.1's rasterize forward consumed by the reference
(/root/reference/street_gaussians_ns/sgn_splatfacto.py:954-996); verified
against ops.rasterize_ref in tests/test_rasterize.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rasterize_ref import ALPHA_CLAMP, ALPHA_THRESH, SIGMA_MIN, T_EPS
from .tiles import TileBins


def composite_chunk(
    T_in: jax.Array,      # (..., P) transmittance entering the chunk
    done_in: jax.Array,   # (..., P) bool: pixel already terminated
    alpha: jax.Array,     # (..., K, P) raw alpha = opac * exp(-sigma), pre-clamp
    skip: jax.Array,      # (..., K, P) bool: sigma<0 / below thresh / invalid
    colors: jax.Array,    # (..., K, C)
):
    """One chunk of front-to-back compositing, vectorized over K.

    Returns (accum_delta (..., P, C), T_out (..., P), done_out (..., P)).
    Exact per-splat skip/termination semantics of ops.rasterize_ref.body:
    a splat whose contribution would push T <= T_EPS contributes nothing,
    T freezes at its pre-termination value, and all splats behind it (in
    this and every later chunk, via done_out latching) are dead.
    """
    alpha = jnp.minimum(ALPHA_CLAMP, alpha)
    active = (~skip) & (alpha >= ALPHA_THRESH) & (~done_in[..., None, :])
    a_eff = jnp.where(active, alpha, 0.0)

    # Naive running T including every active splat (valid up to the first
    # terminator, which is all we read from it).
    one_minus = 1.0 - a_eff
    T_naive = T_in[..., None, :] * jnp.cumprod(one_minus, axis=-2)  # (..., K, P)
    term = active & (T_naive <= T_EPS)
    # done[k] = any terminator at j <= k  (cummax of bool).
    done = jnp.cumsum(term.astype(jnp.int32), axis=-2) > 0
    contributes = active & (~done)

    a_c = jnp.where(contributes, alpha, 0.0)
    om = 1.0 - a_c
    cum_incl = jnp.cumprod(om, axis=-2)
    # Exclusive cumprod: T before splat k (relative to chunk entry).
    cum_excl = cum_incl / om  # om >= 1 - 0.999 = 1e-3, safe exact division
    T_before = T_in[..., None, :] * cum_excl
    w = a_c * T_before                                        # (..., K, P)
    accum_delta = jnp.einsum("...kp,...kc->...pc", w, colors)
    T_out = T_in * cum_incl[..., -1, :]
    done_out = done_in | done[..., -1, :]
    return accum_delta, T_out, done_out


def composite_tiles(
    xys: jax.Array,        # (N, 2)
    conics: jax.Array,     # (N, 3)
    colors: jax.Array,     # (N, C)
    opacities: jax.Array,  # (N,)
    bins: TileBins,
    tile_ids: jax.Array,   # (T_local,) int32 tiles to composite
    tile_size: int,
    max_per_tile: int,
    chunk: int = 32,
):
    """Composite an explicit set of tiles. Returns (accum (T_local, P, C)
    premultiplied, alpha (T_local, P)). This is the shardable core: a
    'model'-parallel render strips `tile_ids` across devices
    (parallel.sharded) while the single-device path passes all tiles."""
    ntx = bins.num_tiles_x
    P = tile_size * tile_size
    M = -(-max_per_tile // chunk) * chunk  # round up to chunk multiple

    # Per-tile gathered splat lists (T, M) in sorted (tile, depth) order.
    m = jnp.arange(M, dtype=jnp.int32)[None, :]
    pair_idx = bins.tile_start[tile_ids][:, None] + m
    in_range = m < bins.tile_count[tile_ids][:, None]
    pair_idx = jnp.clip(pair_idx, 0, bins.gauss_idx.shape[0] - 1)
    gidx = bins.gauss_idx[pair_idx]                               # (T, M)

    xy_t = xys[gidx]
    con_t = conics[gidx]
    col_t = colors[gidx].astype(jnp.float32)
    op_t = opacities[gidx]

    # Per-tile pixel centers (T, P).
    px = ((tile_ids % ntx) * tile_size)[:, None].astype(jnp.float32) + (
        jnp.arange(P, dtype=jnp.int32) % tile_size
    )[None, :] + 0.5
    py = ((tile_ids // ntx) * tile_size)[:, None].astype(jnp.float32) + (
        jnp.arange(P, dtype=jnp.int32) // tile_size
    )[None, :] + 0.5

    num_tiles = tile_ids.shape[0]
    C = colors.shape[-1]
    n_chunks = M // chunk

    def body(carry, sl):
        T, done = carry                                            # (T, P) each
        xy, con, col, op, ok = sl        # (T,K,2),(T,K,3),(T,K,C),(T,K),(T,K)
        dx = xy[..., 0:1] - px[:, None, :]                         # (T, K, P)
        dy = xy[..., 1:2] - py[:, None, :]
        a, b, c = con[..., 0:1], con[..., 1:2], con[..., 2:3]
        sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
        alpha = op[..., None] * jnp.exp(-jnp.maximum(sigma, 0.0))
        skip = (~ok[..., None]) | (sigma < SIGMA_MIN)
        delta, T_out, done_out = composite_chunk(
            T, done, alpha, jnp.broadcast_to(skip, alpha.shape), col
        )
        return (T_out, done_out), delta

    # Reshape splat axis into (n_chunks, chunk) and scan.
    def chunked(x):
        return jnp.moveaxis(x.reshape(x.shape[0], n_chunks, chunk, *x.shape[2:]), 1, 0)

    T0 = jnp.ones((num_tiles, P), jnp.float32)
    done0 = jnp.zeros((num_tiles, P), bool)
    (T, _), deltas = jax.lax.scan(
        body, (T0, done0), (chunked(xy_t), chunked(con_t), chunked(col_t),
                            chunked(op_t), chunked(in_range)),
    )
    accum = jnp.sum(deltas, axis=0)                                # (T, P, C)
    return accum, 1.0 - T


def tiles_to_image(tiles: jax.Array, ntx: int, nty: int, tile_size: int,
                   width: int, height: int) -> jax.Array:
    """(T, P, C) or (T, P) tile-major layout -> cropped image."""
    squeeze = tiles.ndim == 2
    if squeeze:
        tiles = tiles[..., None]
    c = tiles.shape[-1]
    img = tiles.reshape(nty, ntx, tile_size, tile_size, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(nty * tile_size,
                                               ntx * tile_size, c)
    img = img[:height, :width]
    return img[..., 0] if squeeze else img


def rasterize_tiles_chunked(
    xys: jax.Array,        # (N, 2)
    conics: jax.Array,     # (N, 3)
    colors: jax.Array,     # (N, C)
    opacities: jax.Array,  # (N,)
    bins: TileBins,
    width: int,
    height: int,
    tile_size: int,
    background: jax.Array,     # (C,)
    max_per_tile: int,
    chunk: int = 32,
):
    """Tile-parallel chunked compositing. Returns (img (H,W,C), alpha (H,W)).

    Same contract as ops.composite_jnp.rasterize_tiles_jnp (splats beyond
    max_per_tile per tile are dropped), but the inner loop is over
    max_per_tile/chunk steps of MXU-shaped work instead of max_per_tile
    steps of scalar-ish FMA.
    """
    ntx, nty = bins.num_tiles_x, bins.num_tiles_y
    tile_ids = jnp.arange(ntx * nty, dtype=jnp.int32)
    accum, alpha_t = composite_tiles(xys, conics, colors, opacities, bins,
                                     tile_ids, tile_size, max_per_tile, chunk)
    img_tiles = accum + (1.0 - alpha_t)[..., None] * background[None, None, :]
    img = tiles_to_image(img_tiles, ntx, nty, tile_size, width, height)
    alpha = tiles_to_image(alpha_t, ntx, nty, tile_size, width, height)
    return img, alpha
