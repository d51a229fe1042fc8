"""The public differentiable render op: project -> bin -> composite.

One pure function `render` maps activated Gaussian attributes + a camera to
{rgb, accumulation, depth}, reproducing the reference's forward semantics
(/root/reference/street_gaussians_ns/sgn_splatfacto.py:793-1001) in a single
fused pass:

  * EWA projection (core.projection, gsplat conventions),
  * tile binning + (tile, depth) lexicographic sort (ops.tiles),
  * chunked front-to-back compositing with rgb and depth as one 4-channel
    color (the reference launches a second CUDA rasterization just for
    depth, :981-996 — on TPU one fused pass halves HBM traffic),
  * sky compositing `rgb*alpha + sky*(1-alpha)` (:973-974) and the
    alpha-normalized, far-fill-10 depth (:996) — both inside the same
    differentiable graph.

Static capacities (`max_pairs`, `max_per_tile`) make every shape fixed so
jit compiles once per camera resolution; callers size them from the scene
(Gaussian count x typical tiles-per-splat) and read `bins.num_pairs` /
`bins.max_tile_count` off the returned RenderOutputs to grow capacity
outside jit (the trainer's growth rule and the portable-path truncation
warning both consume these — engine/trainer.py).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.cameras import Camera, viewmat_from_c2w
from ..core.projection import Projected, project
from .composite_chunked import rasterize_tiles_chunked
from .composite_jnp import rasterize_tiles_jnp
from .tiles import TileBins, bin_gaussians


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render-path configuration (hashable: safe as a jit static arg)."""

    tile_size: int = 16
    max_pairs: int = 2 ** 18       # capacity of the sorted (gaussian, tile) list
    max_rowruns: Optional[int] = None  # (gaussian, tile-row) run capacity;
    #                                    default max_pairs // 2
    max_per_tile: int = 1024       # per-tile splat budget for the portable path
    chunk: int = 32                # splats per compositing chunk
    impl: str = "chunked"          # "chunked" | "scan" | "pallas"
    depth_far_fill: float = 10.0   # sgn_splatfacto.py:996
    interpret: bool = False        # run Pallas kernels in interpret mode
    #                                (required for impl="pallas" off-TPU)
    precision: str = "f32"         # "f32" (exact) | "bf16": conics/
    #                                opacity/colors ride the binning sorts
    #                                as bf16 pairs (~12 ms less per bench
    #                                step; ~2^-8 relative rounding —
    #                                sub-1e-2 on rendered RGB). xy and
    #                                ordering stay exact in both modes.
    depth_slices: int = 1          # >1: single-chip depth-slice
    #                                decomposition (Pallas fused path
    #                                only) — k sequential depth-rank
    #                                windows merged by the exact over
    #                                operator; the superlinear pair/rank
    #                                sorts run per-slice (~k^-0.64 of
    #                                monolithic). max_pairs/max_rowruns
    #                                stay the TOTAL budgets.


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RenderOutputs:
    rgb: jax.Array           # (H, W, 3)
    accumulation: jax.Array  # (H, W, 1)
    depth: jax.Array         # (H, W, 1)
    projected: Projected     # per-gaussian screen-space attrs (for densify stats)
    bins: TileBins


def rasterize(
    proj: Projected,
    colors: jax.Array,       # (N, C) per-splat colors
    opacities: jax.Array,    # (N,) in [0, 1]
    camera: Camera,
    background: jax.Array,   # (C,)
    config: RenderConfig,
    bins: Optional[TileBins] = None,
    last_color_is_depth: bool = False,
):
    """Bin + composite. Returns (img (H,W,C), alpha (H,W), bins)."""
    if config.impl == "pallas" and bins is None:
        # Fused bin+pack+composite: feature columns ride the binning sorts
        # (no per-pair gathers), all under one custom_vjp.
        from .composite_pallas import rasterize_tiles_pallas_fused
        img, alpha, bins = rasterize_tiles_pallas_fused(
            proj, colors, opacities, camera.width, camera.height,
            config.tile_size, background, config.max_pairs,
            config.max_rowruns, interpret=config.interpret,
            last_color_is_depth=last_color_is_depth,
            precision=config.precision,
            depth_slices=config.depth_slices)
        return img, alpha, bins
    if bins is None:
        bins = bin_gaussians(proj, camera.width, camera.height,
                             config.tile_size, config.max_pairs,
                             config.max_rowruns, opacities=opacities)
    if config.impl == "scan":
        img, alpha = rasterize_tiles_jnp(
            proj.xys, proj.conics, colors, opacities, bins,
            camera.width, camera.height, config.tile_size, background,
            config.max_per_tile,
        )
    elif config.impl == "pallas":
        from .composite_pallas import rasterize_tiles_pallas
        img, alpha = rasterize_tiles_pallas(
            proj.xys, proj.conics, colors, opacities, bins,
            camera.width, camera.height, config.tile_size, background,
            interpret=config.interpret,
        )
    else:
        img, alpha = rasterize_tiles_chunked(
            proj.xys, proj.conics, colors, opacities, bins,
            camera.width, camera.height, config.tile_size, background,
            config.max_per_tile, config.chunk,
        )
    return img, alpha, bins


def render(
    means: jax.Array,        # (N, 3) world-space
    scales: jax.Array,       # (N, 3) linear (exp-activated)
    quats: jax.Array,        # (N, 4) wxyz (normalized inside projection)
    opacities: jax.Array,    # (N,) in [0, 1] (sigmoid-activated)
    rgbs: jax.Array,         # (N, 3) per-splat RGB (SH already evaluated)
    camera: Camera,
    config: RenderConfig,
    sky_rgb: Optional[jax.Array] = None,  # (H, W, 3) sky behind the splats
    training: bool = True,
    active: Optional[jax.Array] = None,   # (N,) bool mask of live gaussians
    xys_offset: Optional[jax.Array] = None,  # (N, 2), see below
) -> RenderOutputs:
    """Full forward render of one camera.

    Matches SplatfactoModel.get_outputs + render_gaussian_attrs
    (sgn_splatfacto.py:793-1001): background for rasterization is zeros
    (back_color, :311), rgb is clamped to <=1 post-rasterization, the sky is
    composited as rgb*alpha + sky*(1-alpha), depth is alpha-normalized with
    far fill, and eval renders clamp rgb to [0, 1].
    """
    vm = viewmat_from_c2w(camera.c2w)
    # Opacity-aware tile boxes (coverage_q): pairs a splat's alpha could
    # never lift past the compositor's 1/255 skip threshold are never
    # binned — rendering- and gradient-exact, fewer pairs. The binning
    # topology is not differentiated (stop_gradient'd boxes; the fused
    # path's custom_vjp treats enumeration as a constant).
    proj = project(means, scales, quats, vm, camera.fx, camera.fy,
                   camera.cx, camera.cy, camera.width, camera.height,
                   tile_size=config.tile_size,
                   opacities=jax.lax.stop_gradient(opacities))
    if active is not None:
        # Inactive slots emit no tile pairs and render as radius-0.
        proj = dataclasses.replace(
            proj,
            radii=jnp.where(active, proj.radii, 0),
            num_tiles_hit=jnp.where(active, proj.num_tiles_hit, 0),
        )
    if xys_offset is not None:
        # A zero-valued hook: grad w.r.t. xys_offset = screen-space
        # positional gradients, the densification signal the reference gets
        # via xys.retain_grad() (sgn_splatfacto.py:889-890, 513-541).
        proj = dataclasses.replace(proj, xys=proj.xys + xys_offset)

    # rgb + depth as one 4-channel composite (bg = 0 for both).
    colors4 = jnp.concatenate([rgbs, proj.depths[:, None]], axis=-1)
    background = jnp.zeros((4,), jnp.float32)
    img, alpha, bins = rasterize(proj, colors4, opacities, camera,
                                 background, config,
                                 last_color_is_depth=True)

    rgb = jnp.minimum(img[..., :3], 1.0)
    alpha1 = alpha[..., None]
    if sky_rgb is not None:
        rgb = rgb * alpha1 + sky_rgb * (1.0 - alpha1)
    if not training:
        rgb = jnp.clip(rgb, 0.0, 1.0)

    depth = jnp.where(alpha1 > 1e-3, img[..., 3:4] / jnp.maximum(alpha1, 1e-3),
                      config.depth_far_fill)

    return RenderOutputs(
        rgb=rgb,
        accumulation=alpha1,
        depth=depth,
        projected=proj,
        bins=bins,
    )
