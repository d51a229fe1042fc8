"""Soak test: N train steps + refines at bench scale on the real TPU,
with periodic finiteness checks over ALL param groups — catches
slow-building pathologies (the round-3 inf-poisoning NaN only surfaced
once splats went invisible mid-training).

Run: python tools/soak_train.py [steps=500]
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import functools
import jax
import jax.numpy as jnp
import numpy as np

from bench_train import scene_cfg, store_from_scene
from street_gaussians_ns_tpu.core.cameras import Camera
from street_gaussians_ns_tpu.engine.scene_train_step import (
    init_scene_train_state, scene_refine_step, scene_train_step)
from street_gaussians_ns_tpu.models.scene_graph import empty_tracks, \
    init_scene_graph_store
from street_gaussians_ns_tpu.ops.render import RenderConfig, render

total = int(sys.argv[1]) if len(sys.argv) > 1 else 500
n, cap, w, h = 1_000_000, 1_048_576, 1600, 1056
import dataclasses
cfg = scene_cfg()
cfg = dataclasses.replace(
    cfg, background=dataclasses.replace(
        cfg.background, warmup_length=100, stop_split_at=100000))
bg = store_from_scene(n, cap)
obj = jax.tree.map(lambda x: x[None][:0], bg)
tracks = empty_tracks(num_objects=0, num_frames=2)
store = init_scene_graph_store(bg, obj, tracks, cfg)
state = init_scene_train_state(store, jax.random.PRNGKey(0))
rcfg = RenderConfig(max_pairs=3_407_872, max_rowruns=1_703_936,
                    impl="pallas", precision="bf16")
cam = Camera.make(1200.0, 1200.0, w / 2, h / 2, jnp.eye(3, 4), w, h)

# A structured target so training has something to fit.
gt = render(bg.params.means[:n], jnp.exp(bg.params.scales[:n]) * 1.5,
            bg.params.quats[:n],
            jax.nn.sigmoid(bg.params.opacities[:n, 0]),
            jnp.clip(bg.params.features_dc[:n, 0] * 0.28 + 0.5, 0, 1),
            cam, rcfg)
target = jnp.clip(gt.rgb, 0.0, 1.0)
batch = {"image": target}

step = jax.jit(functools.partial(scene_train_step, config=cfg,
                                 render_config=rcfg, subset_accs=False))
refine = jax.jit(functools.partial(scene_refine_step, config=cfg,
                                   num_train_data=1))

t0 = time.time()
for i in range(total):
    state, m = step(state, tracks, cam, batch)
    if (i + 1) % 100 == 0:
        state, info = refine(state, max_hw=jnp.float32(max(w, h)))
    if (i + 1) % 100 == 0:
        p = state.store.background.params
        act = np.asarray(state.store.background.active)
        bad = {}
        for name in ("means", "scales", "quats", "opacities",
                     "features_dc", "features_rest"):
            x = np.asarray(getattr(p, name))
            nn = int(np.isnan(x).sum()) + int(np.isinf(x).sum())
            if nn:
                bad[name] = nn
        loss = float(m["loss"])
        print(f"step {i + 1}: loss={loss:.4f} psnr={float(m['psnr']):.2f} "
              f"active={int(act.sum())} pairs={int(m['num_pairs'])} "
              f"bad={bad or 'none'} ({time.time() - t0:.0f}s)", flush=True)
        assert np.isfinite(loss), "non-finite loss"
        assert not bad, f"non-finite params: {bad}"
print("SOAK OK", flush=True)
