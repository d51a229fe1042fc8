"""Jitted training step for the single-model (Splatfacto) pipeline.

The reference's per-step flow (nerfstudio Trainer + callbacks, SURVEY.md
§3.1) re-expressed as two pure functions:

  * train_step: forward render -> L1+SSIM+sky losses -> backward (with the
    screen-space xys gradient tap) -> 7 per-group Adam updates -> stats
    accumulation. One XLA program, compiled once per camera resolution.
  * refine_step: models.refinement.refine, called every refine_every steps
    by the host loop (a separate program so the hot path stays lean).

The scene-graph variant lives in engine.scene_train_step.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.cameras import Camera
from ..models import refinement
from ..models.gaussians import GaussianStore
from ..models.splatfacto import SplatfactoConfig, forward, loss_dict
from ..ops.render import RenderConfig
from ..ops.ssim import psnr
from .optimizers import (DEFAULT_GROUPS, AdamState, adam_update, init_adam,
                         schedule)

GAUSSIAN_GROUPS = ("means", "scales", "quats", "features_dc",
                   "features_rest", "opacities")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainState:
    store: GaussianStore
    env_map: Optional[jax.Array]
    opt: Dict[str, AdamState]     # per-group Adam states
    step: jax.Array               # () int32
    rng: jax.Array


def init_train_state(store: GaussianStore, env_map: Optional[jax.Array],
                     rng: jax.Array) -> TrainState:
    opt = {name: init_adam(getattr(store.params, name))
           for name in GAUSSIAN_GROUPS}
    if env_map is not None:
        opt["sky_sphere"] = init_adam(env_map)
    return TrainState(store=store, env_map=env_map, opt=opt,
                      step=jnp.zeros((), jnp.int32), rng=rng)


def train_step(
    state: TrainState,
    camera: Camera,
    batch: dict,
    config: SplatfactoConfig,
    render_config: RenderConfig,
):
    """One optimization step. Returns (new_state, metrics)."""
    rng, k_sky = jax.random.split(state.rng)
    cap = state.store.capacity

    def loss_fn(params, env_map, xys_offset):
        outputs, rout = forward(
            params, state.store.active, camera, state.step, config,
            render_config, env_map=env_map, rng=k_sky, training=True,
            time=batch.get("time"), xys_offset=xys_offset,
        )
        losses = loss_dict(outputs, batch, config)
        total = sum(losses.values())
        return total, (losses, outputs, rout)

    xys_zero = jnp.zeros((cap, 2), jnp.float32)
    (total, (losses, outputs, rout)), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2), has_aux=True)(
        state.store.params, state.env_map, xys_zero)
    param_grads, env_grads, xys_grad = grads

    # Per-group Adam updates (sgn_config.py:71-108 registry).
    new_params = {}
    new_opt = dict(state.opt)
    for name in GAUSSIAN_GROUPS:
        cfg = DEFAULT_GROUPS[name]
        p, s = adam_update(getattr(param_grads, name), state.opt[name],
                           getattr(state.store.params, name),
                           schedule(cfg, state.step), cfg)
        new_params[name] = p
        new_opt[name] = s
    new_env = state.env_map
    if state.env_map is not None:
        cfg = DEFAULT_GROUPS["sky_sphere"]
        new_env, new_opt["sky_sphere"] = adam_update(
            env_grads, state.opt["sky_sphere"], state.env_map,
            schedule(cfg, state.step), cfg)

    store = dataclasses.replace(
        state.store,
        params=dataclasses.replace(state.store.params, **new_params))
    max_hw = max(camera.height, camera.width)
    store = refinement.update_stats(store, xys_grad, rout.projected.radii,
                                    max_hw, state.step, config)

    metrics = {
        "loss": total,
        "psnr": psnr(outputs["rgb"], batch["image"]),
        "gaussian_count": store.num_active,
        "num_pairs": rout.bins.num_pairs,
        "num_rowruns": rout.bins.num_rowruns,
        # Portable-path truncation watch (see scene_train_step).
        "max_tile_count": rout.bins.max_tile_count,
        **losses,
    }
    new_state = TrainState(store=store, env_map=new_env, opt=new_opt,
                           step=state.step + 1, rng=rng)
    return new_state, metrics


def refine_step(
    state: TrainState,
    config: SplatfactoConfig,
    num_train_data: int,
    max_hw: jax.Array,
):
    """Refinement pass (cull/densify/reset). Host loop calls this every
    refine_every steps, AFTER train_step has advanced state.step."""
    rng, k = jax.random.split(state.rng)
    gauss_opt = {name: state.opt[name] for name in GAUSSIAN_GROUPS}
    # The reference's callback sees the just-finished step index (step was
    # already incremented by train_step, so subtract 1).
    store, surgery, info = refinement.refine(
        state.store, state.step - 1, config, num_train_data, max_hw, k)
    gauss_opt = refinement.apply_moment_surgery(gauss_opt, surgery)
    new_opt = dict(state.opt)
    new_opt.update(gauss_opt)
    return dataclasses.replace(state, store=store, opt=new_opt, rng=rng), info
