"""Multi-chip scene-graph training step: DP over cameras x model-sharded
Gaussians x tile-striped compositing, in one shard_map program.

New TPU-native capability (the reference is single-GPU, SURVEY.md §2.4):

  mesh ('data', 'model')
  * 'data'  — one camera/frame per data row (the 3DGS analog of batch DP);
    parameter gradients are summed across rows by the automatic transpose
    of the replicated-parameter broadcast (an XLA psum over ICI).
  * 'model' — background Gaussian capacity is sharded across columns:
    projection + SH run on the local shard, the compact projected
    attributes (xy, depth, conic, radius, rgb, opacity — ~16 floats vs the
    ~59-float raw parameterization) are all-gathered, and (round 4) the
    global DEPTH-RANK order is partitioned into model_size contiguous
    slices: each column BINS ONLY ITS SLICE (per-device pair capacity =
    render_config.max_pairs ~ 1/M of the scene — binning is no longer
    replicated) and composites a full-tile-grid (accum, T) layer; layers
    merge exactly in depth order with the associative over operator
    (_combine_layers — the shard-stream merge compositor). The backward
    retraces the same collectives (all_gather <-> psum_scatter), so
    per-shard parameter gradients arrive already reduced — no
    hand-written backward communication. The chunked (portable) impl
    keeps the round-3 tile-strip scheme.

  Object gaussians (small: O * CAP_o) stay replicated and are composed per
  data row at the row's camera time — full scene-graph semantics
  (models.scene_graph.compose) including bbox deltas and Fourier DC.

This file provides `sharded_scene_train_step` (drop-in peer of
engine.scene_train_step.scene_train_step, taking stacked cameras/batches)
and is what __graft_entry__.dryrun_multichip exercises on a virtual mesh.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.projection import Projected, project
from ..core.cameras import Camera, viewmat_from_c2w
from ..engine.optimizers import DEFAULT_GROUPS, adam_update, schedule
from ..engine.scene_train_step import (GAUSSIAN_GROUPS, SceneTrainState,
                                       _gaussian_group_params)
from ..engine import scene_train_step as sts
from ..models import refinement
from ..models.fourier import fourier_dc
from ..models.scene_graph import (ObjectTracks, SceneGraphConfig,
                                  SceneGraphStore, interpolate_boxes,
                                  object2world, scene_loss_dict)
from ..models.splatfacto import sh_colors, sky_color
from ..ops.composite_chunked import composite_tiles, tiles_to_image
from ..ops.render import RenderConfig
from ..ops.tiles import TileBins, bin_gaussians


def _pad_to(x, n, axis=0, fill=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def _combine_layers(accum, alpha, axis_name="model", bf16=False):
    """Merge per-slice (premultiplied accum, layer alpha) ACROSS the
    model axis with the associative over operator — THE merge compositor
    for model-sharded binning.

    Each model column composites a depth-CONTIGUOUS slice of the global
    depth-rank order into a full-tile-grid layer: accum_m = sum over the
    slice's pairs of c*a*T_within-slice, T_m = 1 - alpha_m. Because
    slices partition the rank order, sequential front-to-back compositing
    factorizes exactly:  (C, T) |> (C', T') = (C + T*C', T*T'), applied
    in slice order. (The only semantic deviation from the single-device
    kernel is the T_EPS = 1e-4 early-termination cut, which each slice
    applies to its LOCAL transmittance — pairs a global cut would have
    hard-zeroed contribute their analytic weight <= 1e-4 instead; bounded
    by T_EPS per channel, far below bf16 feature rounding.)

    Autodiff through the python loop + all_gather gives the backward: the
    all_gather transposes to a psum_scatter handing each slice its layer
    cotangent, weighted by the prefix/suffix transmittance products.
    Returns (accum_total (T,PIX,C), alpha_total (T,PIX)).

    bf16=True rides the layer all_gather — the model axis's dominant
    comm term, (M-1) x 33.8 MB/device at bench scale — in bfloat16
    (halves it; the merge arithmetic upcasts back to f32). Only enabled
    when the render pipeline is already bf16-quantized: the layer values
    are premultiplied colors/transmittances in [0, 1], so the ~2^-8
    relative rounding matches the sort-payload rounding budget."""
    if bf16:
        def ag(x):
            return jax.lax.all_gather(x.astype(jnp.bfloat16), axis_name,
                                      axis=0).astype(jnp.float32)
    else:
        def ag(x):
            return jax.lax.all_gather(x, axis_name, axis=0)

    la = ag(accum)                                          # (M, T, PIX, C)
    lt = ag(1.0 - alpha)                                    # (M, T, PIX)
    m = la.shape[0]
    out = jnp.zeros_like(la[0])
    t = jnp.ones_like(lt[0])
    for k in range(m):
        out = out + t[..., None] * la[k]
        t = t * lt[k]
    return out, 1.0 - t


def _combine_alpha(alpha, axis_name="model"):
    """Alpha-only layer merge: 1 - prod_m (1 - alpha_m) (order-free)."""
    lt = jax.lax.all_gather(1.0 - alpha, axis_name, axis=0)
    return 1.0 - jnp.prod(lt, axis=0)


def sharded_scene_loss(
    mesh: Mesh,
    config: SceneGraphConfig,
    render_config: RenderConfig,
    width: int,
    height: int,
    cap_bg: int,
    subset_accs: bool = True,
):
    """Builds the shard_mapped loss: (gauss_params, env, bbox, xys offsets,
    tracks, cam dict (B,...), batch dict (B,...), step, sky rngs) ->
    (mean loss, aux). B must equal mesh 'data' size; cap_bg divisible by
    'model' size.

    subset_accs=False drops the object/background accumulation strip
    composites (the entropy loss they feed is inactive before
    stop_split_at — engine.scene_train_step mirrors this), turning the
    hot phase's 3x strip compositing into 1x."""
    model_size = mesh.shape["model"]
    data_size = mesh.shape["data"]
    ts = render_config.tile_size
    ntx = -(-width // ts)
    nty = -(-height // ts)
    num_tiles = ntx * nty
    tiles_pad = -(-num_tiles // model_size) * model_size
    tl = tiles_pad // model_size
    assert cap_bg % model_size == 0

    def per_device(gauss, env, bbox, off_bg, off_obj, tracks, cam, batch,
                   step, rngs):
        # --- local camera (leading local axis is 1) ------------------------
        cam = jax.tree.map(lambda x: x[0], cam)
        batch = {k: (v[0] if v is not None else None)
                 for k, v in batch.items()}
        rng = rngs[0]
        camera = Camera(fx=cam["fx"], fy=cam["fy"], cx=cam["cx"],
                        cy=cam["cy"], c2w=cam["c2w"], time=cam["time"],
                        width=width, height=height)

        bg = {k: gauss[k]["bg"] for k in GAUSSIAN_GROUPS}    # local shards
        obj = {k: gauss[k]["obj"] for k in GAUSSIAN_GROUPS}  # replicated
        bg_active = gauss["active"]["bg_active"]
        obj_active = gauss["active"]["obj_active"]

        # --- scene composition (objects replicated, cheap) ----------------
        boxes = interpolate_boxes(
            tracks, camera.time,
            delta_center=bbox["delta_center"] if bbox else None,
            delta_yaw=bbox["delta_yaw"] if bbox else None,
            delta_rot=bbox["delta_rot"] if bbox else None,
            mode=config.bbox_mode,
            differentiable=config.bbox_differentiable,
        )
        o_means, o_quats = object2world(obj["means"], obj["quats"], boxes)
        o_dc = jax.vmap(fourier_dc)(obj["features_dc"], boxes.t_norm)
        n_obj = o_means.shape[0]

        def flat_obj(x):
            return x.reshape((-1,) + x.shape[2:])

        vm = viewmat_from_c2w(camera.c2w)

        def project_set(means, scales_log, quats, active, xys_off, op):
            # Opacity-aware coverage (core.projection.coverage_q), same as
            # the single-device render path — keeps pair enumeration (and
            # any per-tile truncation order) identical across the two.
            pr = project(means, jnp.exp(scales_log), quats, vm, camera.fx,
                         camera.fy, camera.cx, camera.cy, width, height,
                         tile_size=ts,
                         opacities=jax.lax.stop_gradient(op))
            return dataclasses.replace(
                pr,
                xys=pr.xys + xys_off,
                radii=jnp.where(active, pr.radii, 0),
                num_tiles_hit=jnp.where(active, pr.num_tiles_hit, 0))

        # background: project the LOCAL shard, then all-gather the compact
        # screen-space attributes across 'model'.
        op_bg_pre = jnp.where(bg_active,
                              jax.nn.sigmoid(bg["opacities"][:, 0]), 0.0)
        pr_bg = project_set(bg["means"], bg["scales"], bg["quats"],
                            bg_active, off_bg, op_bg_pre)
        dc_bg = fourier_dc(bg["features_dc"], jnp.float32(0.0))
        rgb_bg = sh_colors(bg["means"], dc_bg, bg["features_rest"], camera,
                           step, config.base, True)
        op_bg = op_bg_pre

        def ag(x):
            return jax.lax.all_gather(x, "model", axis=0, tiled=True)

        pr_bg_g = jax.tree.map(ag, pr_bg)
        rgb_bg_g = ag(rgb_bg)
        op_bg_g = ag(op_bg)

        # objects: replicated full set.
        obj_flat_active = flat_obj(obj_active & boxes.visible[:, None])
        op_obj = jnp.where(obj_flat_active,
                           jax.nn.sigmoid(flat_obj(obj["opacities"])[:, 0]),
                           0.0)
        pr_obj = project_set(
            flat_obj(o_means), flat_obj(obj["scales"]), flat_obj(o_quats),
            obj_flat_active, flat_obj(off_obj), op_obj)
        rgb_obj = sh_colors(flat_obj(o_means), flat_obj(o_dc),
                            flat_obj(obj["features_rest"]), camera, step,
                            config.base, True)

        pr = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), pr_bg_g,
                          pr_obj)
        rgbs = jnp.concatenate([rgb_bg_g, rgb_obj])
        opac = jnp.concatenate([op_bg_g, op_obj])
        n_total = opac.shape[0]
        seg_obj = jnp.arange(n_total) >= cap_bg

        colors4 = jnp.concatenate([rgbs, pr.depths[:, None]], axis=-1)

        # --- composite ------------------------------------------------------
        m_idx = jax.lax.axis_index("model")
        my_tiles = m_idx * tl + jnp.arange(tl, dtype=jnp.int32)

        use_pallas = render_config.impl == "pallas" and ts == 16

        # Pallas path (round 4): MODEL-SHARDED BINNING. The depth-rank
        # order is partitioned into model_size contiguous slices; each
        # column bins ONLY its slice (row trim, ragged expansions, pair
        # sort, kernel stream, gradient-reduce rank sort are all sized by
        # the PER-DEVICE render_config.max_pairs ~ 1/M of the scene —
        # this removes the replicated-binning Amdahl cap of rounds 2-3)
        # and composites a full-tile-grid (accum, T) LAYER; layers merge
        # exactly in depth order via the associative over operator
        # (_combine_layers). Only the (N,)-shaped depth-key sort + the
        # final (N,) gradient un-sort stay replicated (~5 ms at 1M — see
        # README "scaling model").
        bins = None
        if use_pallas:
            from ..ops.composite_pallas import composite_tiles_pallas_fused
            n_pad = -(-n_total // model_size) * model_size
            slice_size = n_pad // model_size

            def padn(x):
                return _pad_to(x, n_pad, axis=0)

            # Pad rows have num_tiles_hit == 0 -> depth key +inf -> they
            # sort to the tail and emit no pairs.
            pr_pad = jax.tree.map(padn, pr)
            colors4_pad = padn(colors4)
            opac_pad = padn(opac)
            seg_obj_pad = padn(seg_obj)
            slice0 = m_idx * slice_size

            def layer(opac_in, colors_in):
                return composite_tiles_pallas_fused(
                    pr_pad, colors_in, opac_in, 0, num_tiles, width,
                    height, render_config.max_pairs,
                    render_config.max_rowruns,
                    interpret=render_config.interpret,
                    last_color_is_depth=True,
                    precision=render_config.precision,
                    slice0=slice0, slice_size=slice_size,
                    # Pair-balanced device windows (round 5): trim
                    # counts all_gather over 'model' and quantile bounds
                    # replace the equal-count split (measured 1.68x pair
                    # imbalance at the bench depth distribution).
                    balance_axis="model" if model_size > 1 else None)

            accum_l, alpha_l, bins_main = layer(opac_pad, colors4_pad)
            # bf16 gather only when there is something to gather: at
            # M=1 it would just quantize the lone layer (and break the
            # (1,1)-mesh bit-identical-to-single-device property).
            accum_t, alpha_t = _combine_layers(
                accum_l, alpha_l,
                bf16=(render_config.precision == "bf16"
                      and model_size > 1))
            if subset_accs:
                # Alpha-only subset layers: zeroed opacities emit no
                # pairs (opacity-aware coverage), colors are ignored.
                _, a_obj_l, _ = layer(
                    jnp.where(seg_obj_pad, opac_pad, 0.0), colors4_pad)
                _, a_bg_l, _ = layer(
                    jnp.where(seg_obj_pad, 0.0, opac_pad), colors4_pad)
                alpha_obj = _combine_alpha(a_obj_l)
                alpha_bg = _combine_alpha(a_bg_l)
            else:
                alpha_obj = jnp.zeros_like(alpha_t)
                alpha_bg = jnp.zeros_like(alpha_t)
        else:
            bins = bin_gaussians(pr, width, height, ts,
                                 render_config.max_pairs,
                                 render_config.max_rowruns, opacities=opac)
            bins_main = bins

        if not use_pallas:
            # Portable (chunked) fallback keeps the round-3 TILE-STRIP
            # scheme: replicated binning, each column composites its
            # contiguous strip of tiles, strips all_gather into the frame.
            def strip(opac_in, colors_in):
                end = bins.tile_start[-1] + bins.tile_count[-1]
                bins_pad = dataclasses.replace(
                    bins,
                    tile_start=jnp.concatenate([
                        bins.tile_start,
                        jnp.full((tiles_pad - num_tiles,), 1,
                                 jnp.int32) * end]),
                    tile_count=_pad_to(bins.tile_count, tiles_pad))
                return composite_tiles(
                    pr.xys, pr.conics, colors_in, opac_in, bins_pad,
                    my_tiles, ts, render_config.max_per_tile,
                    render_config.chunk)

            accum_s, alpha_s = strip(opac, colors4)

            def gather_tiles(x):
                return jax.lax.all_gather(x, "model", axis=0,
                                          tiled=True)[:num_tiles]

            accum_t = gather_tiles(accum_s)
            alpha_t = gather_tiles(alpha_s)
            if subset_accs:
                ones1 = jnp.ones((n_total, 1), jnp.float32)
                _, alpha_obj_s = strip(jnp.where(seg_obj, opac, 0.0), ones1)
                _, alpha_bg_s = strip(jnp.where(seg_obj, 0.0, opac), ones1)
                alpha_obj = gather_tiles(alpha_obj_s)
                alpha_bg = gather_tiles(alpha_bg_s)
            else:
                alpha_obj = jnp.zeros_like(alpha_t)
                alpha_bg = jnp.zeros_like(alpha_t)

        img4 = tiles_to_image(accum_t, ntx, nty, ts, width, height)
        alpha = tiles_to_image(alpha_t, ntx, nty, ts, width, height)[..., None]

        rgb = jnp.minimum(img4[..., :3], 1.0)
        sky = None
        if env is not None:
            # Model-sharded sky: the cubemap sampler is ~19 ms fwd+bwd at
            # bench scale and was replicated on every column (an Amdahl
            # term of the model axis). Each column samples its pixel-row
            # BAND (same jitter stream as the full-frame draw — the bands
            # compose exactly), then one small all_gather (H*W*3 f32
            # ~20 MB total) assembles the frame; the backward transpose
            # psum_scatters the band cotangents.
            if use_pallas and model_size > 1:
                band = -(-height // model_size)
                sky_band = sky_color(env, camera, rng,
                                     row0=m_idx * band, rows=band)
                sky = jax.lax.all_gather(
                    sky_band, "model", axis=0, tiled=True)[:height]
            else:
                sky = sky_color(env, camera, rng)
            rgb = rgb * alpha + sky * (1.0 - alpha)
        depth = jnp.where(alpha > 1e-3, img4[..., 3:4] / jnp.maximum(alpha, 1e-3),
                          render_config.depth_far_fill)

        outputs = {
            "rgb": rgb, "accumulation": alpha, "depth": depth,
            "object_acc": tiles_to_image(alpha_obj, ntx, nty, ts, width,
                                         height)[..., None],
            "background_acc": tiles_to_image(alpha_bg, ntx, nty, ts, width,
                                             height)[..., None],
        }
        # BAND-SHARDED SSIM (round 4, the largest replicated loss term —
        # ~10 ms fwd+bwd at bench scale): each model column evaluates the
        # SSIM map over its band of map rows (+10-row halo, exact
        # composition — ops.ssim.ssim_band_mean), psum makes the VALUE
        # replicated while the gradient flows only through the local
        # band; the collective transpose of the parameter broadcast sums
        # the per-column contributions.
        ssim_fn = None
        if use_pallas and model_size > 1:
            from ..ops.ssim import ssim_band_mean

            map_h = height - 10
            sband = -(-map_h // model_size)

            def ssim_fn(a, b):
                part = ssim_band_mean(a, b, m_idx * sband, sband)
                return jax.lax.psum(part, "model")

        losses = scene_loss_dict(outputs, batch, config, step,
                                 ssim_fn=ssim_fn)
        local = sum(losses.values())
        loss = jax.lax.pmean(local, "data")
        psnr_local = -10.0 * jnp.log10(jnp.maximum(
            jnp.mean((outputs["rgb"] - batch["image"]) ** 2), 1e-12))
        aux = {
            "psnr": jax.lax.pmean(psnr_local, "data"),
            # True PER-DEVICE pair count, maxed over BOTH mesh axes: with
            # model-sharded binning each column sees only its slice's
            # pairs, and render_config.max_pairs is the PER-DEVICE
            # capacity the host growth rule guards (the sharded path must
            # never silently truncate any more than the single-device one
            # — gsplat never drops pairs, sgn_splatfacto.py:860-873).
            # Slices are equal in RANK but not in pairs (near slices hit
            # more tiles), so the max is what capacity must cover.
            # stop_gradient: bins_main is an output of the fused strip's
            # custom_vjp, so its leaves are nominally differentiable and
            # pmax has no differentiation rule.
            "num_pairs": jax.lax.pmax(
                jax.lax.stop_gradient(bins_main.num_pairs),
                ("data", "model")),
            "num_rowruns": jax.lax.pmax(
                jax.lax.stop_gradient(bins_main.num_rowruns),
                ("data", "model")),
            # Densest tile: feeds the Trainer's portable-path truncation
            # warning (the chunked fallback composites at most
            # max_per_tile splats per tile — exact there since its bins
            # are replicated; on the Pallas path this is the per-SLICE
            # max, informational only — that path never truncates).
            "max_tile_count": jax.lax.pmax(
                jax.lax.stop_gradient(bins_main.max_tile_count),
                ("data", "model")),
            # radii per gaussian for densification stats: bg local shard is
            # returned sharded; radii were computed pre-gather.
            "bg_radii": pr_bg.radii[None],
            "obj_radii": pr_obj.radii[None],
        }
        return loss, aux

    gauss_spec = {name: {"bg": P("model"), "obj": P()}
                  for name in GAUSSIAN_GROUPS}
    gauss_spec["active"] = {"bg_active": P("model"), "obj_active": P()}
    in_specs = (
        gauss_spec,                 # params + active masks
        P(),                        # env map
        {"delta_center": P(), "delta_yaw": P(), "delta_rot": P()},
        P("model"),                 # xys offset bg
        P(),                        # xys offset obj
        P(),                        # tracks
        {k: P("data") for k in ("fx", "fy", "cx", "cy", "c2w", "time")},
        {"image": P("data"), "semantic": P("data"), "mask": P("data")},
        P(),                        # step
        P("data"),                  # rngs
    )
    out_specs = (P(), {"psnr": P(), "num_pairs": P(), "num_rowruns": P(),
                       "max_tile_count": P(),
                       "bg_radii": P("data", "model"),
                       "obj_radii": P("data")})
    return jax.shard_map(per_device, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def make_sharded_train_step(
    mesh: Mesh,
    config: SceneGraphConfig,
    render_config: RenderConfig,
    width: int,
    height: int,
    cap_bg: int,
    subset_accs: bool = True,
):
    """Returns a jitted (state, tracks, cameras_b, batch_b) -> (state,
    metrics) function; cameras_b/batch_b carry a leading axis equal to the
    'data' mesh size. Pass subset_accs=False for steps before the entropy
    loss activates (host trainer switches variants, as in
    engine.trainer)."""
    loss_fn_sm = sharded_scene_loss(mesh, config, render_config, width,
                                    height, cap_bg, subset_accs=subset_accs)
    data_size = mesh.shape["data"]

    def step_fn(state: SceneTrainState, tracks: ObjectTracks, cam_b: Dict,
                batch_b: Dict):
        store = state.store
        n_obj = store.num_objects
        cap_obj = store.objects.active.shape[1] if n_obj else 0

        rng, *sky = jax.random.split(state.rng, data_size + 1)
        rngs = jnp.stack(sky)

        gauss = {name: _gaussian_group_params(store, name)
                 for name in GAUSSIAN_GROUPS}
        gauss_in = dict(gauss)
        gauss_in["active"] = {"bg_active": store.background.active,
                              "obj_active": store.objects.active}
        bbox = {"delta_center": store.delta_center,
                "delta_yaw": store.delta_yaw,
                "delta_rot": store.delta_rot}
        off_bg = jnp.zeros((cap_bg, 2), jnp.float32)
        off_obj = jnp.zeros((n_obj, cap_obj, 2), jnp.float32)

        def wrapped(gauss_params, env, bbox_p, ob, oo):
            gi = dict(gauss_params)
            gi["active"] = gauss_in["active"]
            return loss_fn_sm(gi, env, bbox_p, ob, oo, tracks, cam_b,
                              batch_b, state.step, rngs)

        (loss, aux), grads = jax.value_and_grad(
            wrapped, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            gauss, store.env_map, bbox, off_bg, off_obj)
        g_gauss, g_env, g_bbox, g_off_bg, g_off_obj = grads
        g_gauss = sts.mask_inactive_grads(g_gauss, store)

        new_opt = dict(state.opt)
        new_gauss = {}
        for name in GAUSSIAN_GROUPS:
            cfg = DEFAULT_GROUPS[name]
            p, s = adam_update(g_gauss[name], state.opt[name], gauss[name],
                               schedule(cfg, state.step), cfg)
            new_gauss[name] = p
            new_opt[name] = s
        new_env = store.env_map
        if store.env_map is not None and "sky_sphere" in state.opt:
            cfg = DEFAULT_GROUPS["sky_sphere"]
            new_env, new_opt["sky_sphere"] = adam_update(
                g_env, state.opt["sky_sphere"], store.env_map,
                schedule(cfg, state.step), cfg)
        new_bbox = bbox
        if "bbox_opt" in state.opt:
            cfg = DEFAULT_GROUPS["bbox_opt"]
            new_bbox, new_opt["bbox_opt"] = adam_update(
                g_bbox, state.opt["bbox_opt"], bbox,
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

        # Densification stats: radii maxed over data rows (a gaussian is
        # "visible this step" if any camera saw it), grads summed across
        # rows by the collective transpose already.
        max_hw = max(height, width)
        bg_radii = jnp.max(aux["bg_radii"], axis=0)
        bg_store = refinement.update_stats(
            new_store.background, g_off_bg, bg_radii, max_hw, state.step,
            config.background)
        obj_store = new_store.objects
        if n_obj:
            obj_radii = jnp.max(aux["obj_radii"], axis=0).reshape(
                n_obj, cap_obj)
            obj_store = jax.vmap(
                functools.partial(refinement.update_stats, max_hw=max_hw,
                                  step=state.step,
                                  config=config.object_template)
            )(new_store.objects, g_off_obj, obj_radii)
        new_store = dataclasses.replace(new_store, background=bg_store,
                                        objects=obj_store)

        metrics = {"loss": loss, "psnr": aux["psnr"],
                   "num_pairs": aux["num_pairs"],
                   "num_rowruns": aux["num_rowruns"],
                   "max_tile_count": aux["max_tile_count"],
                   "gaussian_count": bg_store.num_active
                   + (obj_store.num_active if n_obj else 0)}
        return SceneTrainState(store=new_store, opt=new_opt,
                               step=state.step + 1, rng=rng), metrics

    return jax.jit(step_fn)


def stack_batches(batches, height: int, width: int) -> Dict[str, jax.Array]:
    """Stack per-frame batches, filling neutral mask (all ones) / semantic
    (all DEFAULT) so the shard_map input tree is static."""
    b = len(batches)
    images = jnp.stack([jnp.asarray(x["image"]) for x in batches])
    masks = jnp.stack([
        jnp.asarray(x["mask"]) if x.get("mask") is not None
        else jnp.ones((height, width, 1), bool) for x in batches])
    sems = jnp.stack([
        jnp.asarray(x["semantic"]) if x.get("semantic") is not None
        else jnp.zeros((height, width, 1), jnp.int32) for x in batches])
    return {"image": images, "mask": masks, "semantic": sems}


def stack_cameras(cameras) -> Dict[str, jax.Array]:
    """Stack same-resolution Cameras into the dict layout the sharded step
    consumes (leading axis = data rows)."""
    return {
        "fx": jnp.stack([c.fx for c in cameras]),
        "fy": jnp.stack([c.fy for c in cameras]),
        "cx": jnp.stack([c.cx for c in cameras]),
        "cy": jnp.stack([c.cy for c in cameras]),
        "c2w": jnp.stack([c.c2w for c in cameras]),
        "time": jnp.stack([c.time for c in cameras]),
    }
