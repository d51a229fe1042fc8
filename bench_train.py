"""Training benchmarks: full scene train step at 1M gaussians + a
synthetic time-to-PSNR convergence run.

Complements bench.py (which measures the raw differentiable render step):
this measures what the north-star metrics actually need —

  1. `train_step`: the COMPLETE jitted scene_train_step (render + losses +
     backward + 9-group Adam + densify-stat accumulation) at bench scale
     (1M background gaussians, 1600x1056), with the refinement pass
     amortized at its refine_every=100 cadence.
  2. `time_to_psnr`: a 400x400 synthetic convergence run (BASELINE.json
     configs[0] scale): 10k random gaussians fitted to a target rendered
     from a hidden ground-truth splat set; reports PSNR vs wall-clock.
     (The Waymo seq 10448... time-to-PSNR-33 proxy — the real clip is not
     shipped in this environment.)

Writes bench_train.json and prints one JSON line per section.
Run on the TPU: python bench_train.py [--quick]
"""
from __future__ import annotations

import dataclasses
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_scene
from street_gaussians_ns_tpu.core.cameras import Camera
from street_gaussians_ns_tpu.core.sh import rgb2sh
from street_gaussians_ns_tpu.engine.scene_train_step import (
    init_scene_train_state, scene_refine_step, scene_train_step)
from street_gaussians_ns_tpu.models.gaussians import (GaussianParams,
                                                      GaussianStore)
from street_gaussians_ns_tpu.models.scene_graph import (SceneGraphConfig,
                                                        empty_tracks,
                                                        forward_scene,
                                                        init_scene_graph_store)
from street_gaussians_ns_tpu.models.splatfacto import SplatfactoConfig
from street_gaussians_ns_tpu.ops.render import RenderConfig, render


def store_from_scene(n, cap, sh_degree=1, seed=0):
    """GaussianStore over bench.make_scene's street-like distribution."""
    means, scales, quats, opac, rgbs = make_scene(n, seed)
    pad = cap - n
    assert pad >= 0
    from street_gaussians_ns_tpu.core.sh import num_sh_bases

    k = num_sh_bases(sh_degree)
    params = GaussianParams(
        means=jnp.pad(means, ((0, pad), (0, 0))),
        scales=jnp.pad(jnp.log(scales), ((0, pad), (0, 0))),
        # Identity-quat padding like models.gaussians.init_gaussians
        # (zero rows are also grad-safe now, but stay consistent).
        quats=jnp.concatenate([
            quats, jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32),
                            (pad, 1))]),
        features_dc=jnp.pad(rgb2sh(rgbs)[:, None, :],
                            ((0, pad), (0, 0), (0, 0))),
        features_rest=jnp.zeros((cap, k - 1, 3), jnp.float32),
        opacities=jnp.pad(jnp.log(opac / (1 - opac))[:, None],
                          ((0, pad), (0, 0))),
    )
    active = jnp.arange(cap) < n
    return GaussianStore(params=params, active=active,
                         xys_grad_norm=jnp.zeros((cap,), jnp.float32),
                         vis_counts=jnp.zeros((cap,), jnp.float32),
                         max_2dsize=jnp.zeros((cap,), jnp.float32))


def scene_cfg(sh_degree=1, env_res=64):
    return SceneGraphConfig(
        base=SplatfactoConfig(sh_degree=sh_degree, env_map_res=env_res),
        background=SplatfactoConfig(
            capacity=0, fourier_features_dim=1, sh_degree=sh_degree,
            warmup_length=500, refine_every=100, stop_split_at=25000),
        object_template=SplatfactoConfig(
            capacity=0, fourier_features_dim=1, sh_degree=sh_degree),
    )


def bench_train_step(quick=False):
    on_tpu = jax.default_backend() == "tpu"
    n = 1_000_000 if on_tpu else 20_000
    cap = 1_048_576 if on_tpu else 32_768
    w, h = (1600, 1056) if on_tpu else (400, 400)
    cfg = scene_cfg()
    bg = store_from_scene(n, cap)
    obj = jax.tree.map(lambda x: x[None][:0], bg)
    tracks = empty_tracks(num_objects=0, num_frames=2)
    store = init_scene_graph_store(bg, obj, tracks, cfg)
    state = init_scene_train_state(store, jax.random.PRNGKey(0))
    rcfg = RenderConfig(
        max_pairs=3_407_872 if on_tpu else 2 ** 17,
        max_rowruns=1_703_936 if on_tpu else None,
        impl="pallas" if on_tpu else "chunked",
        interpret=False,
        precision="bf16" if on_tpu else "f32")

    cam = Camera.make(1200.0, 1200.0, w / 2, h / 2, jnp.eye(3, 4), w, h)
    target = jnp.full((h, w, 3), 0.4, jnp.float32)
    batch = {"image": target}

    step = jax.jit(functools.partial(
        scene_train_step, config=cfg, render_config=rcfg,
        subset_accs=False))
    refine = jax.jit(functools.partial(scene_refine_step, config=cfg,
                                       num_train_data=1))

    state, m = step(state, tracks, cam, batch)
    jax.block_until_ready(m["loss"])             # compile step
    s2, info = refine(state, max_hw=jnp.float32(max(w, h)))
    jax.block_until_ready(s2.step)               # compile refine

    iters = 4 if quick else 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, tracks, cam, batch)
    jax.block_until_ready(m["loss"])
    dt_step = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    n_ref = 2 if quick else 5
    for _ in range(n_ref):
        state, info = refine(state, max_hw=jnp.float32(max(w, h)))
    jax.block_until_ready(state.step)
    dt_refine = (time.perf_counter() - t0) / n_ref

    refine_every = cfg.background.refine_every
    amortized = dt_step + dt_refine / refine_every
    row = {
        "metric": "train_step_per_s",
        "value": round(1.0 / amortized, 2),
        "unit": "steps/s",
        "detail": {
            "ms_train_step": round(dt_step * 1e3, 2),
            "ms_refine": round(dt_refine * 1e3, 2),
            "refine_every": refine_every,
            "ms_amortized": round(amortized * 1e3, 2),
            "gaussians": n, "capacity": cap, "resolution": [w, h],
            "backend": jax.default_backend(),
            "precision": rcfg.precision,
            # 30k-step training projection (the reference trains 30k
            # steps in ~0.5h on a 4090, README.md:65 -> 16.7 steps/s).
            "projected_30k_steps_min": round(30_000 * amortized / 60, 1),
        },
    }
    print(json.dumps(row), flush=True)
    return row


def bench_time_to_psnr(quick=False):
    """Synthetic convergence: fit 10k random splats to a target rendered
    from a hidden ground-truth set; PSNR vs wall-clock."""
    on_tpu = jax.default_backend() == "tpu"
    w = h = 400
    cfg = scene_cfg(env_res=32)
    rcfg = RenderConfig(max_pairs=2 ** 19,
                        impl="pallas" if on_tpu else "chunked",
                        precision="bf16" if on_tpu else "f32")
    cam = Camera.make(300.0, 300.0, w / 2, h / 2, jnp.eye(3, 4), w, h)

    # Ground truth: a denser, opaque scene rendered once.
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
    # Reset after compile warmup.
    store = init_scene_graph_store(store_from_scene(10_000, cap, seed=1),
                                   obj, tracks, cfg)
    state = init_scene_train_state(store, jax.random.PRNGKey(0))

    total = 200 if quick else 2000
    refine_every = cfg.background.refine_every
    curve = []
    t0 = time.perf_counter()
    for i in range(total):
        state, m = step(state, tracks, cam, batch)
        if (i + 1) % refine_every == 0 and i + 1 >= 500:
            state, _ = refine(state, max_hw=jnp.float32(w))
        if (i + 1) % (50 if quick else 200) == 0:
            psnr = float(m["psnr"])              # device sync
            curve.append({"step": i + 1, "psnr": round(psnr, 2),
                          "wall_s": round(time.perf_counter() - t0, 2)})
    row = {
        "metric": "synthetic_psnr_curve",
        "value": curve[-1]["psnr"] if curve else float("nan"),
        "unit": "dB",
        "detail": {"curve": curve, "steps": total,
                   "resolution": [w, h],
                   "backend": jax.default_backend()},
    }
    print(json.dumps(row), flush=True)
    return row


def bench_time_to_psnr_fullres(quick=False):
    """Bench-scale convergence: 1M gaussians at 1600x1056 fitted to a
    target rendered from a DIFFERENT (denser, re-seeded) splat set — the
    closest available proxy for time-to-PSNR on a Waymo frame (the real
    clips are not shipped in this environment)."""
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        return None
    n, cap, w, h = 1_000_000, 1_048_576, 1600, 1056
    cfg = scene_cfg()
    cfg = dataclasses.replace(
        cfg, background=dataclasses.replace(
            cfg.background, warmup_length=100, stop_split_at=100000))
    rcfg = RenderConfig(max_pairs=3_407_872, max_rowruns=1_703_936,
                        impl="pallas", precision="bf16")
    cam = Camera.make(1200.0, 1200.0, w / 2, h / 2, jnp.eye(3, 4), w, h)

    gt_means, gt_scales, gt_quats, gt_opac, gt_rgbs = make_scene(
        1_000_000, seed=11)
    gt = render(gt_means, gt_scales * 1.6, gt_quats,
                jnp.minimum(gt_opac * 1.4, 0.99), gt_rgbs, cam, rcfg)
    target = jnp.clip(gt.rgb, 0.0, 1.0)

    bg = store_from_scene(n, cap, seed=3)
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
    state, _ = refine(state, max_hw=jnp.float32(max(w, h)))
    jax.block_until_ready(state.step)
    # Fresh state after compile warmup.
    store = init_scene_graph_store(store_from_scene(n, cap, seed=3), obj,
                                   tracks, cfg)
    state = init_scene_train_state(store, jax.random.PRNGKey(0))

    total = 200 if quick else 1200
    curve = []
    t0 = time.perf_counter()
    for i in range(total):
        state, m = step(state, tracks, cam, batch)
        if (i + 1) % 100 == 0:
            state, _ = refine(state, max_hw=jnp.float32(max(w, h)))
            psnr = float(m["psnr"])
            curve.append({"step": i + 1, "psnr": round(psnr, 2),
                          "wall_s": round(time.perf_counter() - t0, 2)})
    row = {
        "metric": "fullres_psnr_curve",
        "value": curve[-1]["psnr"] if curve else float("nan"),
        "unit": "dB",
        "detail": {"curve": curve, "steps": total,
                   "resolution": [w, h], "gaussians": n,
                   "backend": jax.default_backend()},
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    quick = "--quick" in sys.argv
    rows = [bench_train_step(quick), bench_time_to_psnr(quick)]
    full = bench_time_to_psnr_fullres(quick)
    if full is not None:
        rows.append(full)
    json.dump(rows, open("bench_train.json", "w"), indent=2)
    print("wrote bench_train.json", flush=True)


if __name__ == "__main__":
    main()
