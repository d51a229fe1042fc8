"""Tile-binned alpha compositing in pure jnp (portable path).

Used on CPU (tests, dry runs) and as the autodiff-checked fallback for the
Pallas production kernel. Same semantics as ops.rasterize_ref but organized
exactly like the production path: per-tile gathered splat lists from
TileBins, front-to-back masked compositing, fixed `max_per_tile` capacity.

Shapes are static: (num_tiles, max_per_tile) gathers + a lax.scan over the
per-tile splat axis with (num_tiles, pixels_per_tile) state. Autodiff
through the scan yields exactly the gsplat-style backward (the skip /
termination masks gate the gradients).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .rasterize_ref import ALPHA_CLAMP, ALPHA_THRESH, SIGMA_MIN, T_EPS
from .tiles import TileBins


def rasterize_tiles_jnp(
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
):
    """Returns (img (H, W, C), alpha (H, W)). Splats beyond max_per_tile per
    tile are dropped (callers size the capacity; the Pallas path has no such
    per-tile cap)."""
    ntx, nty = bins.num_tiles_x, bins.num_tiles_y
    num_tiles = ntx * nty
    P = tile_size * tile_size
    C = colors.shape[-1]

    # Gather per-tile splat lists: (T, M).
    m = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    pair_idx = bins.tile_start[:, None] + m                       # (T, M)
    in_range = m < bins.tile_count[:, None]
    pair_idx = jnp.clip(pair_idx, 0, bins.gauss_idx.shape[0] - 1)
    gidx = bins.gauss_idx[pair_idx]                               # (T, M)

    xy_t = xys[gidx]                                              # (T, M, 2)
    con_t = conics[gidx]                                          # (T, M, 3)
    col_t = colors[gidx]                                          # (T, M, C)
    op_t = opacities[gidx]                                        # (T, M)

    # Per-tile pixel centers: (T, P).
    tid = jnp.arange(num_tiles, dtype=jnp.int32)
    tx0 = (tid % ntx) * tile_size
    ty0 = (tid // ntx) * tile_size
    lp = jnp.arange(P, dtype=jnp.int32)
    px = tx0[:, None].astype(jnp.float32) + (lp % tile_size)[None, :] + 0.5
    py = ty0[:, None].astype(jnp.float32) + (lp // tile_size)[None, :] + 0.5

    def body(carry, splat):
        T, accum, done = carry                                    # (T, P), (T, P, C), (T, P)
        xy, conic, color, opac, ok = splat                        # (T, 2), (T,3), (T,C), (T,), (T,)
        dx = xy[:, 0:1] - px                                      # (T, P)
        dy = xy[:, 1:2] - py
        a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
        sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
        alpha = jnp.minimum(ALPHA_CLAMP,
                            opac[:, None] * jnp.exp(-jnp.maximum(sigma, 0.0)))
        considered = (ok[:, None] & (sigma >= SIGMA_MIN)
                      & (alpha >= ALPHA_THRESH) & (~done))
        next_T = T * (1.0 - alpha)
        terminate = considered & (next_T <= T_EPS)
        contributes = considered & (~terminate)
        w = jnp.where(contributes, alpha * T, 0.0)
        accum = accum + w[..., None] * color[:, None, :]
        T = jnp.where(contributes, next_T, T)
        done = done | terminate
        return (T, accum, done), None

    T0 = jnp.ones((num_tiles, P), jnp.float32)
    accum0 = jnp.zeros((num_tiles, P, C), jnp.float32)
    done0 = jnp.zeros((num_tiles, P), bool)
    splats = (
        jnp.moveaxis(xy_t, 1, 0),
        jnp.moveaxis(con_t, 1, 0),
        jnp.moveaxis(col_t, 1, 0),
        op_t.T,
        in_range.T,
    )
    (T, accum, _), _ = jax.lax.scan(body, (T0, accum0, done0), splats)

    img_tiles = accum + T[..., None] * background[None, None, :]
    alpha_tiles = 1.0 - T

    # (T, P, C) -> (H, W, C): tiles cover the padded image; crop.
    img = img_tiles.reshape(nty, ntx, tile_size, tile_size, C)
    img = img.transpose(0, 2, 1, 3, 4).reshape(nty * tile_size, ntx * tile_size, C)
    alpha = alpha_tiles.reshape(nty, ntx, tile_size, tile_size)
    alpha = alpha.transpose(0, 2, 1, 3).reshape(nty * tile_size, ntx * tile_size)
    return img[:height, :width], alpha[:height, :width]
