"""Jitted training step for the scene-graph model.

Mirrors the reference's full training flow (SURVEY.md §3.1-3.2) in two XLA
programs: `scene_train_step` (compose -> render -> losses -> backward ->
per-group Adam over background+objects+sky+bbox) and `scene_refine_step`
(background refinement + vmapped per-object refinement, each with its own
config, like the per-submodel callbacks in scene_graph:131-140).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.cameras import Camera
from ..models import refinement
from ..models.gaussians import GaussianStore
from ..models.scene_graph import (ObjectTracks, SceneGraphConfig,
                                  SceneGraphStore, forward_scene,
                                  scene_loss_dict)
from ..ops.render import RenderConfig
from ..ops.ssim import psnr
from .optimizers import (DEFAULT_GROUPS, AdamState, adam_update, init_adam,
                         schedule)
from .train_step import GAUSSIAN_GROUPS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneTrainState:
    store: SceneGraphStore
    opt: Dict[str, AdamState]
    step: jax.Array
    rng: jax.Array
    # Per-camera pose deltas (num_cameras, 6) when the camera optimizer
    # is enabled (config.camera_opt_mode != "off"); None otherwise.
    camera_opt: Optional[jax.Array] = None


def _gaussian_group_params(store: SceneGraphStore, name: str):
    """Each gaussian group holds one leaf per submodel — the reference's
    list-of-tensors per optimizer group (C4), here {"bg","obj"} dicts."""
    return {"bg": getattr(store.background.params, name),
            "obj": getattr(store.objects.params, name)}


def mask_inactive_grads(g_gauss: Dict, store: SceneGraphStore) -> Dict:
    """Zero the gradient rows of INACTIVE store slots before Adam.

    Inactive slots hold all-zero parameters; degenerate-input gradient
    paths (norm-at-zero and friends) can emit NaN for exactly those rows
    even though they contribute nothing to the render. Rendering stays
    correct (the rows are masked), but Adam would write the NaNs into the
    parameters — poisoning checkpoints and any unmasked consumer. The
    value-side normalizers are zero-safe too (core.quaternions.normalize);
    this mask is the defense-in-depth guarantee that state stays finite."""
    bg_act = store.background.active
    obj_act = store.objects.active

    def mask_one(g):
        bg = jnp.where(
            bg_act.reshape((-1,) + (1,) * (g["bg"].ndim - 1)), g["bg"], 0.0)
        obj = jnp.where(
            obj_act.reshape(obj_act.shape + (1,) * (g["obj"].ndim - 2)),
            g["obj"], 0.0)
        return {"bg": bg, "obj": obj}

    return {name: mask_one(g) for name, g in g_gauss.items()}


def init_scene_train_state(store: SceneGraphStore, rng: jax.Array,
                           camera_opt: Optional[jax.Array] = None
                           ) -> SceneTrainState:
    opt = {name: init_adam(_gaussian_group_params(store, name))
           for name in GAUSSIAN_GROUPS}
    if store.env_map is not None:
        opt["sky_sphere"] = init_adam(store.env_map)
    if store.delta_center.size:
        opt["bbox_opt"] = init_adam({"delta_center": store.delta_center,
                                     "delta_yaw": store.delta_yaw,
                                     "delta_rot": store.delta_rot})
    if camera_opt is not None:
        opt["camera_opt"] = init_adam(
            camera_opt,
            accum_steps=DEFAULT_GROUPS["camera_opt"].accum_steps)
    return SceneTrainState(store=store, opt=opt,
                           step=jnp.zeros((), jnp.int32), rng=rng,
                           camera_opt=camera_opt)


def scene_train_step(
    state: SceneTrainState,
    tracks: ObjectTracks,
    camera: Camera,
    batch: dict,
    config: SceneGraphConfig,
    render_config: RenderConfig,
    subset_accs: bool = True,
    camera_index: Optional[jax.Array] = None,
):
    """One scene-graph optimization step. Returns (new_state, metrics).

    subset_accs=False drops the object/background accumulation renders
    (only needed once the entropy loss activates past stop_split_at) —
    the host trainer switches variants at the boundary.

    camera_index selects this step's row of the camera-pose deltas when
    the camera optimizer is enabled (config.camera_opt_mode != "off");
    its gradients accumulate over DEFAULT_GROUPS["camera_opt"]
    .accum_steps calls (the reference's {"camera_opt": 100})."""
    rng, k_sky = jax.random.split(state.rng)
    store = state.store
    cap_bg = store.background.capacity
    n_obj = store.num_objects
    # objects store leaves are stacked (O, CAP_o, ...), so capacity is axis 1.
    cap_obj = store.objects.active.shape[1] if n_obj else 0
    n_flat = cap_bg + n_obj * cap_obj

    use_cam_opt = (state.camera_opt is not None
                   and config.camera_opt_mode != "off")

    def loss_fn(gauss_params, env_map, bbox_params, xys_offset, cam_opt):
        cam = camera
        if use_cam_opt:
            from ..models.camera_opt import CameraOptConfig, apply_camera_opt
            idx = (camera_index if camera_index is not None
                   else jnp.zeros((), jnp.int32))
            cam = dataclasses.replace(
                camera,
                c2w=apply_camera_opt(
                    CameraOptConfig(mode=config.camera_opt_mode,
                                    num_cameras=cam_opt.shape[0]),
                    cam_opt, idx, camera.c2w))
        s = dataclasses.replace(
            store,
            background=dataclasses.replace(
                store.background,
                params=dataclasses.replace(
                    store.background.params,
                    **{k: v["bg"] for k, v in gauss_params.items()})),
            objects=dataclasses.replace(
                store.objects,
                params=dataclasses.replace(
                    store.objects.params,
                    **{k: v["obj"] for k, v in gauss_params.items()})),
            env_map=env_map,
            delta_center=bbox_params["delta_center"],
            delta_yaw=bbox_params["delta_yaw"],
            delta_rot=bbox_params["delta_rot"],
        )
        outputs, rout, _ = forward_scene(
            s, tracks, cam, state.step, config, render_config,
            rng=k_sky, training=True, xys_offset=xys_offset,
            subset_accs=subset_accs,
            # Camera-pose gradients must flow through the sky sampling
            # when the camera optimizer is on (ops.cubemap auto mode
            # otherwise stop-gradients the sampling geometry).
            sky_dirs_grad=use_cam_opt)
        losses = scene_loss_dict(outputs, batch, config, state.step)
        return sum(losses.values()), (losses, outputs, rout)

    gauss_params = {name: _gaussian_group_params(store, name)
                    for name in GAUSSIAN_GROUPS}
    bbox_params = {"delta_center": store.delta_center,
                   "delta_yaw": store.delta_yaw,
                   "delta_rot": store.delta_rot}
    xys_zero = jnp.zeros((n_flat, 2), jnp.float32)

    cam_opt_in = (state.camera_opt if use_cam_opt
                  else jnp.zeros((1, 6), jnp.float32))
    (total, (losses, outputs, rout)), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True)(
        gauss_params, store.env_map, bbox_params, xys_zero, cam_opt_in)
    g_gauss, g_env, g_bbox, g_xys, g_cam = grads
    g_gauss = mask_inactive_grads(g_gauss, store)

    # --- per-group Adam ----------------------------------------------------
    new_opt = dict(state.opt)
    new_gauss = {}
    for name in GAUSSIAN_GROUPS:
        cfg = DEFAULT_GROUPS[name]
        p, s = adam_update(g_gauss[name], state.opt[name], gauss_params[name],
                           schedule(cfg, state.step), cfg)
        new_gauss[name] = p
        new_opt[name] = s
    new_env = store.env_map
    if store.env_map is not None:
        cfg = DEFAULT_GROUPS["sky_sphere"]
        new_env, new_opt["sky_sphere"] = adam_update(
            g_env, state.opt["sky_sphere"], store.env_map,
            schedule(cfg, state.step), cfg)
    new_bbox = bbox_params
    if "bbox_opt" in state.opt:
        cfg = DEFAULT_GROUPS["bbox_opt"]
        new_bbox, new_opt["bbox_opt"] = adam_update(
            g_bbox, state.opt["bbox_opt"], bbox_params,
            schedule(cfg, state.step), cfg)
    new_cam_opt = state.camera_opt
    if use_cam_opt and "camera_opt" in state.opt:
        cfg = DEFAULT_GROUPS["camera_opt"]
        new_cam_opt, new_opt["camera_opt"] = adam_update(
            g_cam, state.opt["camera_opt"], state.camera_opt,
            schedule(cfg, state.step), cfg)

    new_store = dataclasses.replace(
        store,
        background=dataclasses.replace(
            store.background,
            params=dataclasses.replace(
                store.background.params,
                **{k: v["bg"] for k, v in new_gauss.items()})),
        objects=dataclasses.replace(
            store.objects,
            params=dataclasses.replace(
                store.objects.params,
                **{k: v["obj"] for k, v in new_gauss.items()})),
        env_map=new_env,
        delta_center=new_bbox["delta_center"],
        delta_yaw=new_bbox["delta_yaw"],
        delta_rot=new_bbox["delta_rot"],
    )

    # --- densification stats per submodel (flat-buffer slicing replaces the
    # reference's retain_grad property split, scene_graph:166-215) ----------
    max_hw = max(camera.height, camera.width)
    bg_store = refinement.update_stats(
        new_store.background, g_xys[:cap_bg], rout.projected.radii[:cap_bg],
        max_hw, state.step, config.background)
    obj_store = new_store.objects
    if n_obj:
        g_obj = g_xys[cap_bg:].reshape(n_obj, cap_obj, 2)
        r_obj = rout.projected.radii[cap_bg:].reshape(n_obj, cap_obj)
        obj_store = jax.vmap(
            functools.partial(refinement.update_stats, max_hw=max_hw,
                              step=state.step, config=config.object_template)
        )(new_store.objects, g_obj, r_obj)
    new_store = dataclasses.replace(new_store, background=bg_store,
                                    objects=obj_store)

    # Parity with get_metrics_dict (sgn_splatfacto.py:1015-1040).
    bg_act = bg_store.active
    n_act = jnp.maximum(jnp.sum(bg_act), 1)
    metrics = {
        "loss": total,
        "psnr": psnr(outputs["rgb"], batch["image"]),
        "gaussian_count": (bg_store.num_active
                           + (obj_store.num_active if n_obj else 0)),
        "scale_mean": jnp.sum(jnp.where(
            bg_act[:, None], jnp.exp(bg_store.params.scales), 0.0)) / (3 * n_act),
        "log_scale_mean": jnp.sum(jnp.where(
            bg_act[:, None], bg_store.params.scales, 0.0)) / (3 * n_act),
        "sigmoid_opacity": jnp.sum(jnp.where(
            bg_act, jax.nn.sigmoid(bg_store.params.opacities[:, 0]), 0.0)) / n_act,
        "radii_mean": jnp.mean(rout.projected.radii.astype(jnp.float32)),
        # True (pre-capacity) pair count — the trainer's growth rule reads
        # this to double max_pairs before any pair is dropped (gsplat
        # never drops, sgn_splatfacto.py:860-873).
        "num_pairs": rout.bins.num_pairs,
        "num_rowruns": rout.bins.num_rowruns,
        # Densest tile (portable-path truncation watch: chunked/scan
        # impls drop pairs past max_per_tile; the trainer warns when this
        # exceeds that budget — ops.tiles.TileBins.max_tile_count).
        "max_tile_count": rout.bins.max_tile_count,
        **losses,
    }
    return SceneTrainState(store=new_store, opt=new_opt,
                           step=state.step + 1, rng=rng,
                           camera_opt=new_cam_opt), metrics


def _split_opt(opt: Dict[str, AdamState], key: str) -> Dict[str, AdamState]:
    return {name: AdamState(mu=opt[name].mu[key], nu=opt[name].nu[key],
                            count=opt[name].count)
            for name in GAUSSIAN_GROUPS}


def scene_refine_step(
    state: SceneTrainState,
    config: SceneGraphConfig,
    num_train_data: int,
    max_hw: jax.Array,
):
    """Refine background + all objects (each submodel with its own config,
    like the per-submodel refinement callbacks)."""
    rng, k_bg, k_obj = jax.random.split(state.rng, 3)
    store = state.store
    step = state.step - 1

    bg_opt = _split_opt(state.opt, "bg")
    bg_store, bg_surgery, bg_info = refinement.refine(
        store.background, step, config.background, num_train_data, max_hw,
        k_bg)
    bg_opt = refinement.apply_moment_surgery(bg_opt, bg_surgery)

    obj_store = store.objects
    obj_opt = _split_opt(state.opt, "obj")
    n_obj = store.num_objects
    if n_obj:
        keys = jax.random.split(k_obj, n_obj)
        refine_obj = functools.partial(
            refinement.refine, config=config.object_template,
            num_train_data=num_train_data)
        obj_store, obj_surgery, obj_info = jax.vmap(
            lambda s, k: refine_obj(s, step=step, max_hw=max_hw, rng=k)
        )(store.objects, keys)
        obj_opt = refinement.apply_moment_surgery(obj_opt, obj_surgery)
    else:
        obj_info = {}

    new_opt = dict(state.opt)
    for name in GAUSSIAN_GROUPS:
        new_opt[name] = AdamState(
            mu={"bg": bg_opt[name].mu, "obj": obj_opt[name].mu},
            nu={"bg": bg_opt[name].nu, "obj": obj_opt[name].nu},
            count=state.opt[name].count)

    new_store = dataclasses.replace(store, background=bg_store,
                                    objects=obj_store)
    info = {f"bg_{k}": v for k, v in bg_info.items()}
    info.update({f"obj_{k}": jnp.sum(v) for k, v in obj_info.items()})
    return dataclasses.replace(state, store=new_store, opt=new_opt,
                               rng=rng), info
