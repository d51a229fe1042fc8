"""Scene-graph model: background 4DGS + per-vehicle rigid-posed Gaussians +
sky cubemap, composed in one differentiable graph.

TPU-first re-design of SplatfactoSceneGraphModel
(/root/reference/street_gaussians_ns/sgn_splatfacto_scene_graph.py:41-401):
instead of a ModuleDict of submodels whose tensors are concatenated and
re-split through property setters (:139-224), the scene is data — a
background store plus one stacked object store with a leading object axis.
Composition is a flat concat; per-submodel densification stats fall out of
slicing the flat screen-gradient buffer back into segments. Everything is
fixed-shape, jit-once, and shardable.

Object boxes: tracked SE(3) poses per annotated frame, SLERP/lerp
interpolated at the camera timestamp (dynamic_annotation.py:252-286),
optionally adjusted by the bbox optimizer ("simple" mode: Δcenter + Δyaw,
bbox_optimizers.py:140-166 — whose gradients the reference detaches; we
replicate that inert default and offer a differentiable flag).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core import quaternions as quat
from ..core.cameras import Camera
from ..ops.render import RenderConfig, render
from .fourier import fourier_dc
from .gaussians import GaussianParams, GaussianStore, activated_opacities
from .splatfacto import (SplatfactoConfig, init_env_map, loss_dict, sh_colors,
                         sky_color)


@dataclasses.dataclass(frozen=True)
class SceneGraphConfig:
    """Mirror of SplatfactoSceneGraphModelConfig + the sgn_config.py:44-68
    overrides."""

    base: SplatfactoConfig = SplatfactoConfig(use_sky_sphere=True, sh_degree=3)
    background: SplatfactoConfig = SplatfactoConfig(
        cull_alpha_thresh=0.02, cull_scale_thresh=0.2, warmup_length=500,
        refine_every=100, reset_alpha_every=30, stop_split_at=25000,
        fourier_features_dim=1, use_sky_sphere=False)
    object_template: SplatfactoConfig = SplatfactoConfig(
        cull_alpha_thresh=0.005, cull_scale_thresh=0.2,
        densify_grad_thresh=0.0002, warmup_length=500, refine_every=100,
        reset_alpha_every=30, stop_split_at=25000, fourier_features_dim=5,
        num_random=10000, use_sky_sphere=False)
    object_acc_entropy_loss_mult: float = 0.001
    # BBox pose optimizer modes (bbox_optimizers.py:32): "off" | "simple"
    # (Δcenter + Δyaw) | "SO3xR3" | "SE3" (6-dof exp-map deltas). Quirk
    # replicated from the reference: apply_to_bbox .detach()es the
    # correction into the Box in EVERY mode (:158-164 for simple,
    # :152-157 for SO3xR3/SE3), and get_loss_dict's regularizer is never
    # called by the model — so no gradient ever reaches these params in
    # the shipped config. bbox_differentiable=True fixes that behind a
    # flag (gradients flow into delta_center/delta_rot/delta_yaw).
    bbox_mode: str = "simple"           # "off" | "simple" | "SO3xR3" | "SE3"
    bbox_differentiable: bool = False   # reference detaches (inert) — see C9
    # Camera pose optimizer (reference default mode="off", sgn_config
    # :44; grad-accum 100 when enabled): "off" | "SO3xR3" | "SE3".
    camera_opt_mode: str = "off"
    num_cameras: int = 0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ObjectTracks:
    """Device-side tracked-box database (from annotation.json via the data
    layer). F annotated frames x O objects."""

    times: jax.Array        # (F,) sorted, same clock as Camera.time
    centers: jax.Array      # (F, O, 3) world
    quats: jax.Array        # (F, O, 4) wxyz object->world
    valid: jax.Array        # (F, O) bool: object annotated in frame
    sizes: jax.Array        # (O, 3) canonical box size (EXP_RATE inflated)
    obj_first: jax.Array    # (O,) first annotated frame index (float)
    obj_last: jax.Array     # (O,) last annotated frame index (float)

    @property
    def num_frames(self) -> int:
        return self.times.shape[0]

    @property
    def num_objects(self) -> int:
        return self.centers.shape[1]


def empty_tracks(num_objects: int = 0, num_frames: int = 0) -> ObjectTracks:
    return ObjectTracks(
        times=jnp.zeros((num_frames,), jnp.float32),
        centers=jnp.zeros((num_frames, num_objects, 3), jnp.float32),
        quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                       (num_frames, num_objects, 1)),
        valid=jnp.zeros((num_frames, num_objects), bool),
        sizes=jnp.ones((num_objects, 3), jnp.float32),
        obj_first=jnp.zeros((num_objects,), jnp.float32),
        obj_last=jnp.ones((num_objects,), jnp.float32),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BoxesAtT:
    centers: jax.Array   # (O, 3)
    quats: jax.Array     # (O, 4) object->world
    visible: jax.Array   # (O,) bool
    t_norm: jax.Array    # (O,) per-object normalized track time for Fourier


def interpolate_boxes(
    tracks: ObjectTracks,
    t: jax.Array,
    delta_center: Optional[jax.Array] = None,  # (F, O, 3)
    delta_yaw: Optional[jax.Array] = None,     # (F, O)
    differentiable: bool = False,
    mode: str = "simple",                      # "simple"|"SO3xR3"|"SE3"
    delta_rot: Optional[jax.Array] = None,     # (F, O, 3) omega (exp modes)
) -> BoxesAtT:
    """Boxes at camera time t: exact frame if t matches, else SLERP/lerp
    between bracketing frames over the intersection of live tracks
    (frame_interpolation + Box.interploate, dynamic_annotation.py:75-87,
    156-171). Out-of-range times yield no visible boxes (:271-273).

    The bbox-opt delta is applied only at exact annotated frames, matching
    the reference's exist_frame gate (scene_graph:333-341).

    Modes (bbox_optimizers.py:120-166): "simple" adds Δcenter and
    post-multiplies a yaw quaternion; "SO3xR3"/"SE3" build a correction
    from the exp map of the 6-dof tangent [delta_center | delta_rot] and
    apply center += correction[:3, 3], R = correction[:3, :3] @ R
    (premultiply; the translation is NOT rotated, :152-155). We do not
    replicate the reference's latent double-index bug
    (`correction_matrix[bbox_idx]` at :152 after forward() already
    selected the box)."""
    F = tracks.num_frames
    times = tracks.times
    i1 = jnp.clip(jnp.searchsorted(times, t, side="left"), 0, F - 1)
    i0 = jnp.clip(i1 - 1, 0, F - 1)
    t0, t1 = times[i0], times[i1]
    exact1 = t == t1
    # Weight within [t0, t1]; exact frame -> w in {0, 1}.
    denom = jnp.where(t1 > t0, t1 - t0, 1.0)
    w = jnp.where(exact1, 1.0, jnp.clip((t - t0) / denom, 0.0, 1.0))
    in_range = (t >= times[0]) & (t <= times[-1])

    c0, c1 = tracks.centers[i0], tracks.centers[i1]       # (O, 3)
    q0, q1 = tracks.quats[i0], tracks.quats[i1]           # (O, 4)
    centers = c0 * (1.0 - w) + c1 * w
    quats = quat.slerp(q0, q1, w)

    v0, v1 = tracks.valid[i0], tracks.valid[i1]
    visible = jnp.where(w <= 0.0, v0, jnp.where(w >= 1.0, v1, v0 & v1))
    visible = visible & in_range

    # Per-object normalized track time (get_fourier_features,
    # scene_graph:239-247): (frame - first)/(last - first) in frame-index
    # units; single-frame tracks use 1.0.
    frame_pos = i0.astype(jnp.float32) + w
    span = tracks.obj_last - tracks.obj_first
    t_norm = jnp.where(span > 0,
                       (frame_pos - tracks.obj_first) / jnp.maximum(span, 1e-6),
                       1.0)

    # bbox-opt deltas at exact annotated frames only.
    if delta_center is not None and mode != "off":
        fi = jnp.where(exact1, i1, i0)
        at_exact = exact1 | (w <= 0.0)
        gate = jnp.where(at_exact, 1.0, 0.0)
        dc = delta_center[fi]                              # (O, 3)
        if not differentiable:
            # Reference quirk: apply_to_bbox .detach()es the correction
            # into the box in every mode (bbox_optimizers.py:152-164), so
            # no gradient ever reaches the params — replicated behind the
            # flag.
            dc = jax.lax.stop_gradient(dc)
        if mode in ("SO3xR3", "SE3") and delta_rot is not None:
            from .camera_opt import exp_map_SE3, exp_map_SO3xR3

            dr = delta_rot[fi]                             # (O, 3)
            if not differentiable:
                dr = jax.lax.stop_gradient(dr)
            tangent = jnp.concatenate([dc, dr], axis=-1) * gate[..., None]
            corr = (exp_map_SO3xR3(tangent) if mode == "SO3xR3"
                    else exp_map_SE3(tangent))             # (O, 3, 4)
            # center += correction translation (not rotated, :152-155);
            # rotation premultiplied: R' = corr_R @ R.
            centers = centers + corr[..., :3, 3]
            quats = quat.multiply(quat.from_rotmat(corr[..., :3, :3]),
                                  quats)
        else:
            dy = delta_yaw[fi] if delta_yaw is not None else None  # (O,)
            if dy is None:
                dy = jnp.zeros(centers.shape[:-1], jnp.float32)
            elif not differentiable:
                dy = jax.lax.stop_gradient(dy)
            centers = centers + gate[..., None] * dc
            dyaw = dy * gate
            dq = jnp.stack([jnp.cos(dyaw), jnp.zeros_like(dyaw),
                            jnp.zeros_like(dyaw), jnp.sin(dyaw)], axis=-1)
            quats = quat.multiply(quats, dq)

    return BoxesAtT(centers=centers, quats=quats, visible=visible,
                    t_norm=t_norm)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneGraphStore:
    background: GaussianStore
    objects: GaussianStore          # leaves have leading (O,) axis
    env_map: Optional[jax.Array]
    delta_center: jax.Array         # (F, O, 3) bbox-opt translation / rho
    delta_yaw: jax.Array            # (F, O)    "simple" mode yaw
    delta_rot: jax.Array            # (F, O, 3) SO3xR3/SE3 mode omega

    @property
    def num_objects(self) -> int:
        return self.objects.active.shape[0]


def object2world(
    means: jax.Array,    # (O, C, 3)
    quats_g: jax.Array,  # (O, C, 4)
    boxes: BoxesAtT,
):
    """Rigid object->world transform of per-object gaussians
    (object2world_gs, scene_graph:404-417): means @ R^T + t, quaternion
    premultiply by the box orientation."""
    R = quat.to_rotmat(quat.normalize(boxes.quats))        # (O, 3, 3)
    means_w = jnp.einsum("oij,ocj->oci", R, means) + boxes.centers[:, None, :]
    quats_w = quat.multiply(boxes.quats[:, None, :], quats_g)
    return means_w, quats_w


def compose(
    store: SceneGraphStore,
    tracks: ObjectTracks,
    time: jax.Array,
    training: bool = True,
    config: Optional[SceneGraphConfig] = None,
):
    """Flatten background + posed objects into one splat set.

    Returns (flat GaussianParams-like dict of arrays, active (N,), boxes).
    Layout: [bg (CAP_bg), obj 0 (CAP_o), obj 1 (CAP_o), ...] — slicing by
    this layout recovers per-submodel gradients/stats (replacing the
    reference's property-setter splitting, scene_graph:149-224).
    """
    bg = store.background
    obj = store.objects
    O = store.num_objects

    mode = config.bbox_mode if config is not None else "simple"
    diff = config.bbox_differentiable if config is not None else False
    boxes = interpolate_boxes(
        tracks, time,
        delta_center=store.delta_center if store.delta_center.size else None,
        delta_yaw=store.delta_yaw if store.delta_yaw.size else None,
        delta_rot=store.delta_rot if store.delta_rot.size else None,
        mode=mode,
        differentiable=diff,
    )
    means_w, quats_w = object2world(obj.params.means, obj.params.quats, boxes)

    # Per-object Fourier DC at the object's normalized track time.
    dc_obj = jax.vmap(fourier_dc)(obj.params.features_dc, boxes.t_norm)
    dc_bg = fourier_dc(bg.params.features_dc, jnp.float32(0.0))

    def flat(bg_x, obj_x):
        return jnp.concatenate(
            [bg_x, obj_x.reshape((-1,) + obj_x.shape[2:])], axis=0)

    flat_params = dict(
        means=flat(bg.params.means, means_w),
        scales=flat(bg.params.scales, obj.params.scales),
        quats=flat(bg.params.quats, quats_w),
        features_dc_t=flat(dc_bg, dc_obj),
        features_rest=flat(bg.params.features_rest, obj.params.features_rest),
        opacities=flat(bg.params.opacities, obj.params.opacities),
    )
    obj_active = obj.active & boxes.visible[:, None]
    active = flat(bg.active, obj_active)
    return flat_params, active, boxes


def forward_scene(
    store: SceneGraphStore,
    tracks: ObjectTracks,
    camera: Camera,
    step: jax.Array,
    config: SceneGraphConfig,
    render_config: RenderConfig,
    rng: Optional[jax.Array] = None,
    training: bool = True,
    xys_offset: Optional[jax.Array] = None,
    eval_extras: bool = False,
    subset_accs: bool = True,
    sky_dirs_grad: bool = False,
):
    """Scene-graph forward (get_outputs, scene_graph:305-374): compose,
    render with sky, plus object-only / background-only accumulations (for
    the entropy loss) and eval-only per-submodel RGB renders.

    subset_accs=False skips the two extra compositing passes — a static
    optimization the trainer applies while the entropy loss is inactive
    (step <= background.stop_split_at; the reference wastefully renders
    them every step, scene_graph:364-366)."""
    flat, active, boxes = compose(store, tracks, camera.time, training,
                                  config=config)
    cap_bg = store.background.capacity

    rgbs = sh_colors(flat["means"], flat["features_dc_t"],
                     flat["features_rest"], camera, step, config.base,
                     training)
    opac = jnp.where(active, jax.nn.sigmoid(flat["opacities"][:, 0]), 0.0)
    scales = jnp.exp(flat["scales"])

    sky = None
    if store.env_map is not None:
        sky = sky_color(store.env_map, camera,
                        rng if (training and rng is not None) else None,
                        dirs_grad=sky_dirs_grad)

    out = render(flat["means"], scales, flat["quats"], opac, rgbs, camera,
                 render_config, sky_rgb=sky, training=training, active=active,
                 xys_offset=xys_offset)
    outputs = {"rgb": out.rgb, "accumulation": out.accumulation,
               "depth": out.depth}
    if sky is not None:
        outputs["sky"] = sky

    # Object-only / background-only accumulations (scene_graph:364-366).
    # Re-rendered with subset active masks; colors don't matter for alpha.
    if subset_accs or eval_extras:
        n = active.shape[0]
        seg_obj = jnp.arange(n) >= cap_bg
        obj_active = active & seg_obj
        bg_active = active & (~seg_obj)
        out_obj = render(flat["means"], scales, flat["quats"], opac, rgbs,
                         camera, render_config, training=training,
                         active=obj_active)
        out_bg = render(flat["means"], scales, flat["quats"], opac, rgbs,
                        camera, render_config, training=training,
                        active=bg_active)
        outputs["object_acc"] = out_obj.accumulation
        outputs["background_acc"] = out_bg.accumulation

    if eval_extras:
        # Eval-only per-submodel RGB (scene_graph:367-372).
        bg_rgb = jnp.minimum(out_bg.rgb, 1.0)
        if sky is not None:
            bg_rgb = bg_rgb * out_bg.accumulation + sky * (1 - out_bg.accumulation)
        outputs["background_rgb"] = jnp.clip(bg_rgb, 0.0, 1.0)
        outputs["object_rgb"] = jnp.clip(out_obj.rgb, 0.0, 1.0)
        outputs["background_depth"] = out_bg.depth
        outputs["object_depth"] = out_obj.depth

    return outputs, out, boxes


def scene_loss_dict(
    outputs: dict,
    batch: dict,
    config: SceneGraphConfig,
    step: jax.Array,
    ssim_fn=None,
) -> dict:
    """Base L1+SSIM+sky losses plus the object/background accumulation
    entropy loss, active past the background's stop_split_at
    (scene_graph:376-391). ssim_fn: see models.splatfacto.loss_dict."""
    losses = loss_dict(outputs, batch, config.base, ssim_fn=ssim_fn)
    if config.object_acc_entropy_loss_mult > 0 and "object_acc" in outputs:
        acc = jnp.clip(outputs["object_acc"], 1e-5, 1.0 - 1e-5)
        ent = -(acc * jnp.log(acc) + (1 - acc) * jnp.log(1 - acc))
        gate = (step > config.background.stop_split_at).astype(jnp.float32)
        losses["object_acc_entropy_loss"] = (
            config.object_acc_entropy_loss_mult * gate * jnp.mean(ent))
    return losses


def init_scene_graph_store(
    background: GaussianStore,
    object_stores: GaussianStore,    # stacked, leaves (O, CAP_o, ...)
    tracks: ObjectTracks,
    config: SceneGraphConfig,
) -> SceneGraphStore:
    env = init_env_map(config.base) if config.base.use_sky_sphere else None
    F, O = tracks.num_frames, tracks.num_objects
    return SceneGraphStore(
        background=background,
        objects=object_stores,
        env_map=env,
        delta_center=jnp.zeros((F, O, 3), jnp.float32),
        delta_yaw=jnp.zeros((F, O), jnp.float32),
        delta_rot=jnp.zeros((F, O, 3), jnp.float32),
    )
