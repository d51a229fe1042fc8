"""Densification-dynamics diagnostic (round 5, VERDICT #1a).

Runs the heldout-convergence protocol at configurable scale with FULL
refinement instrumentation so collapse modes are attributable instead of
argued about. Per refine boundary it prints a JSON line with the refine
counters (high_grads / splits / dups / culls / children_dropped / count)
plus active-set percentiles of alpha and avg_grad (the densify signal),
and at every checkpoint the held-out + train PSNR and the sky fraction
(mean 1-accumulation over the train view — how much of the image the
learnable cubemap has absorbed).

Variants (--sky):
  learn  : learnable cubemap, no mask supervision (r4 bench protocol);
  none   : no sky sphere at all;
  masked : GT composited over a procedural directional sky + semantic
           sky masks (reference Waymo regime: segs drive the
           sky_accumulation loss, sgn_splatfacto.py:1042-1094).

Usage (TPU):
  python tools/diag_densify.py --views 5 --sky learn         # r4 repro
  python tools/diag_densify.py --views 24 --sky masked --sigma 0.005
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import make_scene  # noqa: E402
from street_gaussians_ns_tpu.core.cameras import Camera, pixel_directions  # noqa: E402
from street_gaussians_ns_tpu.engine.scene_train_step import (  # noqa: E402
    init_scene_train_state, scene_refine_step, scene_train_step)
from street_gaussians_ns_tpu.models.gaussians import init_gaussians  # noqa: E402
from street_gaussians_ns_tpu.models.scene_graph import (  # noqa: E402
    SceneGraphConfig, empty_tracks, forward_scene, init_scene_graph_store)
from street_gaussians_ns_tpu.models.splatfacto import SplatfactoConfig  # noqa: E402
from street_gaussians_ns_tpu.ops.render import RenderConfig, render  # noqa: E402


def build_cfg(args):
    base = SplatfactoConfig(sh_degree=1, env_map_res=args.env_res,
                            use_sky_sphere=(args.sky != "none"))
    return SceneGraphConfig(
        base=base,
        background=SplatfactoConfig(
            capacity=0, fourier_features_dim=1, sh_degree=1,
            warmup_length=500, refine_every=100,
            stop_split_at=args.stop_split_at),
        object_template=SplatfactoConfig(
            capacity=0, fourier_features_dim=1, sh_degree=1),
    )


def build_protocol(args, rcfg_gt):
    """GT scene + train/heldout targets. Returns (batches, train_cams,
    heldout, seeds). The street scene delegates to the shared builder
    (tools.synth_street.street_protocol — the same one the heldout bench
    uses); the cloud scene reproduces the r4 protocol for A/B."""
    from tools.synth_street import corridor_cams, street_protocol

    w, h = args.res
    if args.scene == "street":
        return street_protocol(args.gt, args.seeds, w, h, args.fx,
                               views=args.views, span=args.span,
                               sigma=args.sigma, rcfg_gt=rcfg_gt,
                               sky=args.sky)

    gt_means, gt_scales, gt_quats, gt_opac, gt_rgbs = make_scene(
        args.gt, seed=11)
    gt_scales = gt_scales * 1.6
    gt_opac = jnp.minimum(gt_opac * 1.4, 0.99)
    kp, kp2, key0 = jax.random.split(jax.random.PRNGKey(17), 3)
    wpal = jax.random.normal(kp, (3, 3)) * 0.35
    wpal2 = jax.random.normal(kp2, (3, 3)) * 1.4
    smooth = (0.5 * jax.nn.sigmoid(gt_means @ wpal.T
                                   + jnp.asarray([0.2, -0.1, 0.3]))
              + 0.25 + 0.25 * jnp.sin(gt_means @ wpal2.T))
    if args.gt_colors == "splatnoise":        # r4 protocol: 45% iid/splat
        gt_rgbs = jnp.clip(0.55 * smooth + 0.45 * gt_rgbs, 0.0, 1.0)
    else:                                     # positional: fittable
        k3, k4 = jax.random.split(key0)
        whf = jax.random.normal(k3, (3, 3)) * 6.0
        whf2 = jax.random.normal(k4, (3, 3)) * 17.0
        hf = 0.22 * jnp.sin(gt_means @ whf.T) + 0.12 * jnp.sin(
            gt_means @ whf2.T + 1.1)
        gt_rgbs = jnp.clip(0.72 * smooth + hf + 0.08 * gt_rgbs, 0.0, 1.0)

    def render_gt(cam):
        out = render(gt_means, gt_scales, gt_quats, gt_opac, gt_rgbs, cam,
                     rcfg_gt)
        rgb = jnp.clip(out.rgb, 0.0, 1.0)
        return rgb, out.accumulation.reshape(rgb.shape[0], rgb.shape[1])

    rgt = jax.jit(render_gt)
    n_all = args.views + max(args.views // 6, 1)
    train_cams, held_cams = corridor_cams(
        n_all, w, h, args.fx, span=args.span,
        heldout_every=max(n_all // max(args.views // 6, 1), 2))
    if not held_cams:
        held_cams = [train_cams.pop()]
    train_cams = train_cams[:args.views]

    key = jax.random.PRNGKey(42)
    batches = []
    for cam in train_cams:
        clean, acc = rgt(cam)
        kg, kn, key = jax.random.split(key, 3)
        gain = 1.0 + 0.03 * jax.random.uniform(kg, (), minval=-1.0, maxval=1.0)
        noisy = jnp.clip(clean * gain
                         + args.sigma * jax.random.normal(kn, clean.shape),
                         0.0, 1.0)
        batches.append({"image": noisy})
    heldout = []
    for cam in held_cams:
        clean, acc = rgt(cam)
        heldout.append((cam, jnp.clip(clean, 0.0, 1.0)))
    jax.block_until_ready(heldout[0][1])

    kj, kc, key = jax.random.split(key, 3)
    idx = jnp.arange(0, args.gt, args.gt // args.seeds)[:args.seeds]
    seed_means = gt_means[idx] + 0.1 * jax.random.normal(kj, (args.seeds, 3))
    seed_colors = np.asarray(jnp.clip(
        gt_rgbs[idx] + 0.05 * jax.random.normal(kc, (args.seeds, 3)),
        0.0, 1.0)) * 255.0
    return batches, train_cams, heldout, (np.asarray(seed_means), seed_colors)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, nargs=2, default=[800, 528])
    ap.add_argument("--fx", type=float, default=600.0)
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--span", type=float, default=10.0)
    ap.add_argument("--sigma", type=float, default=0.01)
    ap.add_argument("--seeds", type=int, default=50_000)
    ap.add_argument("--gt", type=int, default=1_000_000)
    ap.add_argument("--gt-colors", choices=["splatnoise", "positional"],
                    default="splatnoise")
    ap.add_argument("--scene", choices=["cloud", "street"], default="cloud")
    ap.add_argument("--dump-views", default=None,
                    help="write train view 0 + heldout 0 PNGs here and exit")
    ap.add_argument("--cap", type=int, default=1 << 18)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--stop-split-at", type=int, default=25_000)
    ap.add_argument("--sky", choices=["learn", "none", "masked"],
                    default="learn")
    ap.add_argument("--env-res", type=int, default=64)
    ap.add_argument("--max-pairs", type=int, default=1 << 21)
    ap.add_argument("--checkpoint-every", type=int, default=200)
    args = ap.parse_args()
    w, h = args.res

    on_tpu = jax.default_backend() == "tpu"
    cfg = build_cfg(args)
    rcfg = RenderConfig(max_pairs=args.max_pairs,
                        max_rowruns=args.max_pairs // 2,
                        impl="pallas" if on_tpu else "chunked",
                        precision="bf16" if on_tpu else "f32")
    rcfg_gt = dataclasses.replace(rcfg, max_pairs=args.max_pairs * 4,
                                  max_rowruns=args.max_pairs * 2)
    batches, train_cams, heldout, (seed_means, seed_colors) = \
        build_protocol(args, rcfg_gt)
    print(json.dumps({"event": "setup", "views": len(train_cams),
                      "heldout": len(heldout), "seeds": args.seeds,
                      "sky": args.sky, "sigma": args.sigma, "scene": args.scene,
                      "gt_colors": args.gt_colors, "res": [w, h]}),
          flush=True)
    if args.dump_views:
        from PIL import Image
        Image.fromarray(np.asarray(
            batches[0]["image"] * 255, np.uint8)).save(
            args.dump_views + "/train0.png")
        Image.fromarray(np.asarray(
            heldout[0][1] * 255, np.uint8)).save(
            args.dump_views + "/heldout0.png")
        print("wrote preview PNGs to", args.dump_views, flush=True)
        return

    bg = init_gaussians(args.cap, seed_means, seed_colors, sh_degree=1,
                        fourier_dim=1, rng=jax.random.PRNGKey(5))
    obj = jax.tree.map(lambda x: x[None][:0], bg)
    tracks = empty_tracks(num_objects=0, num_frames=2)
    store = init_scene_graph_store(bg, obj, tracks, cfg)
    state = init_scene_train_state(store, jax.random.PRNGKey(0))

    step = jax.jit(functools.partial(
        scene_train_step, config=cfg, render_config=rcfg,
        subset_accs=False))
    refine = jax.jit(functools.partial(
        scene_refine_step, config=cfg, num_train_data=len(train_cams)))

    def heldout_psnr(store):
        vals = []
        for cam, target in heldout:
            out, _, _ = forward_scene(store, tracks, cam,
                                      jnp.int32(100000), cfg, rcfg,
                                      training=False)
            mse = jnp.mean((out["rgb"] - target) ** 2)
            vals.append(-10.0 * jnp.log10(jnp.maximum(mse, 1e-12)))
        # Splat coverage on train view 0: how much of the image the
        # learnable sky has absorbed (1 - mean accumulation).
        out0, _, _ = forward_scene(store, tracks, train_cams[0],
                                   jnp.int32(100000), cfg, rcfg,
                                   training=False)
        return jnp.mean(jnp.asarray(vals)), jnp.mean(out0["accumulation"])

    def probe(state, max_hw):
        """Active-set distributions of the densify drivers."""
        st = state.store.background
        act = st.active
        alpha = jnp.where(act, jax.nn.sigmoid(st.params.opacities[:, 0]),
                          jnp.nan)
        vis = jnp.maximum(st.vis_counts, 1.0)
        ag = jnp.where(act, (st.xys_grad_norm / vis) * 0.5 * max_hw, jnp.nan)
        scale_max = jnp.where(act, jnp.exp(st.params.scales).max(-1), jnp.nan)
        q = jnp.asarray([0.1, 0.5, 0.9, 0.99])
        return {"alpha_q": jnp.nanquantile(alpha, q),
                "avg_grad_q": jnp.nanquantile(ag, q),
                "scale_max_q": jnp.nanquantile(scale_max, q),
                "n_below_cull": jnp.sum(
                    act & (jax.nn.sigmoid(st.params.opacities[:, 0])
                           < cfg.background.cull_alpha_thresh)),
                "n_high_grad": jnp.sum(
                    act & (jnp.nan_to_num(ag) >
                           cfg.background.densify_grad_thresh))}

    heval = jax.jit(heldout_psnr)
    jprobe = jax.jit(probe)

    max_hw = jnp.float32(max(w, h))
    t0 = time.perf_counter()
    for i in range(args.steps):
        cidx = i % len(train_cams)
        state, m = step(state, tracks, train_cams[cidx], batches[cidx])
        if (i + 1) % cfg.background.refine_every == 0:
            pr = {k: np.round(np.asarray(v), 6).tolist()
                  for k, v in jprobe(state, max_hw).items()}
            state, info = refine(state, max_hw=max_hw)
            row = {"event": "refine", "step": i + 1,
                   **{k: int(v) for k, v in info.items()
                      if k.startswith("bg_")}, **pr}
            print(json.dumps(row), flush=True)
        if (i + 1) % args.checkpoint_every == 0:
            hp, acc0 = heval(state.store)
            row = {"event": "checkpoint", "step": i + 1,
                   "heldout_psnr": round(float(hp), 2),
                   "train_acc_mean": round(float(acc0), 3),
                   "train_psnr": round(float(m["psnr"]), 2),
                   "gaussians": int(m["gaussian_count"]),
                   "num_pairs": int(m["num_pairs"]),
                   "wall_s": round(time.perf_counter() - t0, 1)}
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
