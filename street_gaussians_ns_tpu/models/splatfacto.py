"""Splatfacto: one Gaussian cloud + sky cubemap — config, forward, losses.

Functional port of the reference's SplatfactoModel surface
(/root/reference/street_gaussians_ns/sgn_splatfacto.py:153-1094) onto the
fixed-capacity store: `forward` is a pure function (params, camera, step)
-> outputs, jitted by the trainer; losses are pure too. No module state —
densification stats live in the GaussianStore, the step is an argument.

Quirks replicated on purpose (SURVEY.md §7 "behavioral quirks"):
  * `use_scale_regularization` exists but the fork's get_loss_dict never
    applies a scale-reg loss — same here (field kept for config parity).
  * rasterization background is zeros; `background_color` is viewer-only.
  * antialiased mode does NOT multiply opacity by the blur compensation
    (the fork comments it out, :948).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.cameras import Camera, pixel_directions
from ..core.sh import eval_sh
from ..ops.cubemap import sample_cubemap
from ..ops.render import RenderConfig, RenderOutputs, render
from ..ops.ssim import ssim
from .fourier import fourier_dc
from .gaussians import GaussianParams, GaussianStore, activated_opacities


@dataclasses.dataclass(frozen=True)
class SplatfactoConfig:
    """Mirror of SplatfactoModelConfig (sgn_splatfacto.py:153-233) with the
    same defaults; scene-graph overrides come from sgn_config.py:47-68."""

    warmup_length: int = 500
    refine_every: int = 100
    resolution_schedule: int = 250
    num_downscales: int = 0
    cull_alpha_thresh: float = 0.1
    cull_scale_thresh: float = 0.5
    continue_cull_post_densification: bool = True
    reset_alpha_every: int = 30
    use_sky_sphere: bool = True
    sky_acc_loss_mult: float = 0.5
    densify_grad_thresh: float = 0.0002
    densify_size_thresh: float = 0.01
    n_split_samples: int = 2
    sh_degree_interval: int = 1000
    cull_screen_size: float = 0.15
    split_screen_size: float = 0.05
    stop_screen_size_at: int = 4000
    random_init: bool = False
    num_random: int = 50000
    random_scale: float = 10.0
    ssim_lambda: float = 0.2
    stop_split_at: int = 15000
    sh_degree: int = 3
    use_scale_regularization: bool = True  # inert, see module docstring
    max_gauss_ratio: float = 10.0
    rasterize_mode: str = "classic"
    fourier_features_dim: int = 1
    fourier_features_scale: float = 1.0
    env_map_res: int = 1024
    block_width: int = 16
    # Fixed-capacity store size (ours; the torch reference reallocates).
    capacity: int = 2 ** 20
    # Parent-compaction budget for one refine pass: at most
    # max(256, capacity // refine_parent_cap_div) split/dup parents
    # produce children per pass (models.refinement.refine). Parents past
    # the budget neither spawn nor die — they retry next pass. The
    # torch reference has no such budget (it reallocates); the budget is
    # what keeps the XLA scatter input small (element-serial TPU
    # scatter). 16 keeps bench-scale refine ~74 ms at 1M capacity.
    refine_parent_cap_div: int = 16


def sh_colors(
    means: jax.Array,
    features_dc_t: jax.Array,    # (N, 3) time-collapsed DC
    features_rest: jax.Array,    # (N, K-1, 3)
    camera: Camera,
    step: jax.Array,
    config: SplatfactoConfig,
    training: bool = True,
) -> jax.Array:
    """Per-splat RGB via SH (render_gaussian_attrs, sgn_splatfacto.py:933-940):
    viewdirs from detached means/camera, active degree steps up every
    sh_degree_interval during training, full degree at eval, +0.5 clamp."""
    viewdirs = jax.lax.stop_gradient(means) - jax.lax.stop_gradient(camera.c2w[:3, 3])
    viewdirs = viewdirs / jnp.maximum(
        jnp.linalg.norm(viewdirs, axis=-1, keepdims=True), 1e-12)
    if training:
        n = jnp.minimum(step // config.sh_degree_interval, config.sh_degree)
    else:
        n = jnp.asarray(config.sh_degree)
    coeffs = jnp.concatenate([features_dc_t[:, None, :], features_rest], axis=1)
    rgbs = eval_sh(n, viewdirs, coeffs)
    return jnp.maximum(rgbs + 0.5, 0.0)


def init_env_map(config: SplatfactoConfig) -> jax.Array:
    """Learnable sky cubemap, init 0.5 (EnvLight, sgn_splatfacto.py:114-116)."""
    return jnp.full((6, config.env_map_res, config.env_map_res, 3), 0.5,
                    jnp.float32)


# World-dir -> cubemap-dir axis swap (EnvLight.to_opengl @ dir = (x, z, -y),
# sgn_splatfacto.py:113,141).
_TO_OPENGL = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0]])


def sky_color(
    env_map: jax.Array,
    camera: Camera,
    jitter_key: Optional[jax.Array] = None,
    dirs_grad: bool = False,
    row0=0,
    rows: Optional[int] = None,
) -> jax.Array:
    """Per-pixel sky RGB (rows, W, 3): jittered world rays -> cubemap
    lookup (EnvLight.forward, sgn_splatfacto.py:139-150). dirs_grad=True
    when camera-pose gradients must flow through the sky sampling (camera
    optimizer on) — see ops.cubemap.sample_cubemap. row0/rows select a
    pixel-row band (model-sharded sky: each column samples its band and
    the bands all_gather — parallel.sharded)."""
    dirs = pixel_directions(camera, jitter_key, row0=row0, rows=rows)
    dirs = dirs @ _TO_OPENGL.T
    return sample_cubemap(env_map, dirs, dirs_grad=dirs_grad)


def forward(
    params: GaussianParams,
    active: jax.Array,
    camera: Camera,
    step: jax.Array,
    config: SplatfactoConfig,
    render_config: RenderConfig,
    env_map: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    training: bool = True,
    time: Optional[jax.Array] = None,
    xys_offset: Optional[jax.Array] = None,
):
    """One-camera forward render.

    Returns (outputs dict, RenderOutputs). `xys_offset`, when given, is added
    to the projected screen centers — the trainer differentiates w.r.t. it to
    obtain the screen-space positional gradients that drive densification
    (the reference's xys.retain_grad(), sgn_splatfacto.py:889-890).
    """
    dc_t = fourier_dc(params.features_dc,
                      (time if time is not None else jnp.float32(0.0))
                      * config.fourier_features_scale)
    rgbs = sh_colors(params.means, dc_t, params.features_rest, camera, step,
                     config, training)
    opac = activated_opacities(params, active)
    scales = jnp.exp(params.scales)

    sky = None
    if env_map is not None:
        sky = sky_color(env_map, camera, rng if training else None)

    out = render(params.means, scales, params.quats, opac, rgbs, camera,
                 render_config, sky_rgb=sky, training=training, active=active,
                 xys_offset=xys_offset)
    outputs = {
        "rgb": out.rgb,
        "accumulation": out.accumulation,
        "depth": out.depth,
    }
    if sky is not None:
        outputs["sky"] = sky
    return outputs, out


SKY_SEMANTIC = 2  # SemanticType.SKY (data_utils.py:26-29)


def loss_dict(
    outputs: dict,
    batch: dict,
    config: SplatfactoConfig,
    ssim_fn=None,
) -> dict:
    """L1 + SSIM + sky accumulation losses (get_loss_dict,
    sgn_splatfacto.py:1042-1094). batch: {"image" (H,W,3) float in [0,1],
    optional "mask" (H,W,1) bool, optional "semantic" (H,W,1) int}.

    ssim_fn overrides the SSIM mean (same contract as ops.ssim.ssim) —
    the model-sharded path passes a BAND-sharded version whose value is
    psum'd replicated while its compute/gradient covers only the local
    band (parallel.sharded)."""
    gt = batch["image"].astype(jnp.float32)
    rgb = outputs["rgb"]
    if "mask" in batch and batch["mask"] is not None:
        m = batch["mask"].astype(jnp.float32)
        gt = gt * m
        rgb = rgb * m
    l1 = jnp.mean(jnp.abs(gt - rgb))
    simloss = 1.0 - (ssim_fn or ssim)(gt, rgb)
    losses = {
        "Ll1": (1.0 - config.ssim_lambda) * l1,
        "simloss": config.ssim_lambda * simloss,
    }
    if ("semantic" in batch and batch["semantic"] is not None
            and config.sky_acc_loss_mult > 0):
        sky_mask = (batch["semantic"] == SKY_SEMANTIC).astype(jnp.float32)
        losses["sky_accumulation"] = config.sky_acc_loss_mult * jnp.mean(
            sky_mask * outputs["accumulation"])
    return losses
