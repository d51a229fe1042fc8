"""Oracle rasterizer: exact, slow, per-pixel scan over depth-sorted Gaussians.

This is the numeric reference every production kernel is tested against —
the same role gsplat's `_torch_impl` plays for its CUDA kernels (the pattern
the reference repo relies on; see SURVEY.md §4). It reproduces the gsplat
v0.1 compositing semantics used by the reference plugin
(rasterize_gaussians call sites sgn_splatfacto.py:954-996):

  per pixel, front-to-back over splats sorted by view depth:
    sigma  = 0.5*(a*dx^2 + c*dy^2) + b*dx*dy       (dx = center - pixel_center)
    alpha  = min(0.999, opacity * exp(-max(sigma, 0)))
    skip   if sigma < SIGMA_MIN (-1e-3) or alpha < 1/255
    next_T = T * (1 - alpha); if next_T <= 1e-4: STOP (before accumulating)
    out   += color * alpha * T;  T = next_T
  final: out += T * background;  alpha_out = 1 - T

  The sigma-negative skip deviates from gsplat's strict `sigma < 0` by a
  dead band: for positive-definite conics the direct quadratic is >= 0 up
  to rounding dust (squares dominate, AM-GM bounds the cross term), so
  gsplat's test only ever fires on degenerate/indefinite conics — where
  sigma dives far below -1e-3 within a pixel. The band makes the rule
  robust to FORMULATION rounding (the production kernel evaluates sigma
  as a tile-local polynomial on the MXU, which rounds differently by
  ~1e-5), with the relu clamp keeping alpha <= opacity in the band.

A splat contributes only to pixels whose tile lies in its row-adaptive
ellipse coverage (core.projection.row_tile_range), matching the
tile-based visibility of the production binning exactly.

Differentiable end-to-end via lax.scan + where-masking (the masks reproduce
the skip/termination rules, so autodiff grads match the hand-derived
backward of the production kernels).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.projection import row_tile_range

ALPHA_THRESH = 1.0 / 255.0
ALPHA_CLAMP = 0.999
T_EPS = 1e-4
SIGMA_MIN = -1e-3   # sigma-negative skip dead band (module docstring)


def rasterize_reference(
    xys: jax.Array,        # (N, 2) pixel centers
    depths: jax.Array,     # (N,)
    radii: jax.Array,      # (N,) int32; 0 = skip entirely
    conics: jax.Array,     # (N, 3)
    colors: jax.Array,     # (N, C)
    opacities: jax.Array,  # (N,) post-sigmoid
    tile_box: jax.Array,   # (N, 4) int32 [x0, x1, y0, y1) tile bounds
    width: int,
    height: int,
    tile_size: int = 16,
    background: jax.Array | None = None,  # (C,)
):
    """Returns (img (H, W, C), alpha (H, W))."""
    C = colors.shape[-1]
    if background is None:
        background = jnp.zeros((C,), colors.dtype)

    # Global stable sort by depth (invisible splats pushed to the end).
    visible = radii > 0
    sort_depth = jnp.where(visible, depths, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)

    xys_s = xys[order]
    conics_s = conics[order]
    colors_s = colors[order]
    opac_s = opacities[order]
    vis_s = visible[order]
    box_s = tile_box[order]

    px = jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5   # (1, W)
    py = jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5  # (H, 1)
    tile_x = (jnp.arange(width) // tile_size)[None, :]
    tile_y = (jnp.arange(height) // tile_size)[:, None]

    def body(carry, splat):
        T, accum, done = carry
        xy, conic, color, opac, vis, box = splat
        dx = xy[0] - px  # (1, W) broadcast -> (H, W)
        dy = xy[1] - py
        sigma = 0.5 * (conic[0] * dx * dx + conic[2] * dy * dy) + conic[1] * dx * dy
        alpha = jnp.minimum(ALPHA_CLAMP,
                            opac * jnp.exp(-jnp.maximum(sigma, 0.0)))
        # Row-adaptive coverage: the pixel's tile must be one of the
        # columns the 3-sigma ellipse covers in the pixel's tile row —
        # the EXACT predicate bin_gaussians enumerates pairs with
        # (core.projection.row_tile_range), so oracle and production see
        # identical pair sets.
        x0r, x1r = row_tile_range(conic[None, None, :], xy[None, None, :],
                                  box[None, None, :], tile_y, tile_size)
        in_box = (tile_x >= x0r) & (tile_x < x1r)
        considered = (vis & in_box & (sigma >= SIGMA_MIN)
                      & (alpha >= ALPHA_THRESH) & (~done))
        next_T = T * (1.0 - alpha)
        terminate = considered & (next_T <= T_EPS)
        contributes = considered & (~terminate)
        w = jnp.where(contributes, alpha * T, 0.0)
        accum = accum + w[..., None] * color[None, None, :]
        T = jnp.where(contributes, next_T, T)
        done = done | terminate
        return (T, accum, done), None

    T0 = jnp.ones((height, width), jnp.float32)
    accum0 = jnp.zeros((height, width, C), jnp.float32)
    done0 = jnp.zeros((height, width), bool)
    (T, accum, _), _ = jax.lax.scan(
        body, (T0, accum0, done0), (xys_s, conics_s, colors_s, opac_s, vis_s, box_s)
    )
    img = accum + T[..., None] * background[None, None, :]
    return img, 1.0 - T
