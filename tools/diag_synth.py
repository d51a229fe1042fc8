"""Instrumented replica of bench_train.bench_time_to_psnr (round 5,
VERDICT #2): the synthetic 400x400 time-to-PSNR-33 run with per-refine
counters, to attribute the r3->r4 regression (33 dB crossed at step
~1000 in r3, ~1400 in r4). Flags toggle the suspects:

  --parent-div N : refine parent-compaction budget divisor (r4: 16)
  --cull-mode {all,replaced} : r3 culled EVERY split parent (children
      placed or not); r4 only culls parents whose full child family
      landed. `all` restores the r3 rule for A/B.

Prints JSON lines; ~90 s per run on the TPU.
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

sys.path.insert(0, ".")
from bench import make_scene  # noqa: E402
from bench_train import scene_cfg, store_from_scene  # noqa: E402
from street_gaussians_ns_tpu.core.cameras import Camera  # noqa: E402
from street_gaussians_ns_tpu.engine.scene_train_step import (  # noqa: E402
    init_scene_train_state, scene_refine_step, scene_train_step)
from street_gaussians_ns_tpu.models.scene_graph import (  # noqa: E402
    empty_tracks, init_scene_graph_store)
from street_gaussians_ns_tpu.ops.render import RenderConfig, render  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parent-div", type=int, default=16)
    ap.add_argument("--steps", type=int, default=2000)
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    w = h = 400
    cfg = scene_cfg(env_res=32)
    cfg = dataclasses.replace(
        cfg, background=dataclasses.replace(
            cfg.background, refine_parent_cap_div=args.parent_div))
    rcfg = RenderConfig(max_pairs=2 ** 19,
                        impl="pallas" if on_tpu else "chunked",
                        precision="bf16" if on_tpu else "f32")
    cam = Camera.make(300.0, 300.0, w / 2, h / 2, jnp.eye(3, 4), w, h)

    gt_means, gt_scales, gt_quats, gt_opac, gt_rgbs = make_scene(30_000,
                                                                seed=7)
    gt = render(gt_means, gt_scales * 2.0, gt_quats,
                jnp.minimum(gt_opac * 1.5, 0.99), gt_rgbs, cam,
                dataclasses.replace(rcfg, max_pairs=2 ** 19))
    target = jnp.clip(gt.rgb, 0.0, 1.0)

    cap = 32_768
    bg = store_from_scene(10_000, cap, seed=1)
    obj = jax.tree.map(lambda x: x[None][:0], bg)
    tracks = empty_tracks(num_objects=0, num_frames=2)
    store = init_scene_graph_store(bg, obj, tracks, cfg)
    state = init_scene_train_state(store, jax.random.PRNGKey(0))
    batch = {"image": target}

    step = jax.jit(functools.partial(
        scene_train_step, config=cfg, render_config=rcfg,
        subset_accs=False))
    refine = jax.jit(functools.partial(scene_refine_step, config=cfg,
                                       num_train_data=1))

    state, m = step(state, tracks, cam, batch)
    state, _ = refine(state, max_hw=jnp.float32(w))
    jax.block_until_ready(state.step)
    store = init_scene_graph_store(store_from_scene(10_000, cap, seed=1),
                                   obj, tracks, cfg)
    state = init_scene_train_state(store, jax.random.PRNGKey(0))

    refine_every = cfg.background.refine_every
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = step(state, tracks, cam, batch)
        if (i + 1) % refine_every == 0 and i + 1 >= 500:
            state, info = refine(state, max_hw=jnp.float32(w))
            print(json.dumps({
                "event": "refine", "step": i + 1,
                **{k: int(v) for k, v in info.items()
                   if k.startswith("bg_")}}), flush=True)
        if (i + 1) % 100 == 0:
            print(json.dumps({
                "event": "checkpoint", "step": i + 1,
                "psnr": round(float(m["psnr"]), 2),
                "gaussians": int(m["gaussian_count"]),
                "wall_s": round(time.perf_counter() - t0, 2)}), flush=True)


if __name__ == "__main__":
    main()
