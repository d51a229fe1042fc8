"""Sharded-path sanity + overhead on ONE real chip: run the shard_mapped
train step on a (1, 1) mesh at bench scale and compare against the
single-device scene_train_step. Validates the production fused-strip
compositor compiles and runs COMPILED (not interpret) inside shard_map on
real hardware, and quantifies the sharded wrapper's overhead."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import functools
import jax
import jax.numpy as jnp

from bench_train import scene_cfg, store_from_scene
from street_gaussians_ns_tpu.core.cameras import Camera
from street_gaussians_ns_tpu.engine.scene_train_step import (
    init_scene_train_state, scene_train_step)
from street_gaussians_ns_tpu.models.scene_graph import empty_tracks, \
    init_scene_graph_store
from street_gaussians_ns_tpu.ops.render import RenderConfig
from street_gaussians_ns_tpu.parallel.mesh import make_mesh
from street_gaussians_ns_tpu.parallel.sharded import (
    make_sharded_train_step, stack_batches, stack_cameras)
from street_gaussians_ns_tpu.parallel.trainer import place_state

n, cap, w, h = 1_000_000, 1_048_576, 1600, 1056
cfg = scene_cfg()
bg = store_from_scene(n, cap)
obj = jax.tree.map(lambda x: x[None][:0], bg)
tracks = empty_tracks(num_objects=0, num_frames=2)
store = init_scene_graph_store(bg, obj, tracks, cfg)
rcfg = RenderConfig(max_pairs=3_407_872, max_rowruns=1_703_936,
                    impl="pallas", precision="bf16")
cam = Camera.make(1200.0, 1200.0, w / 2, h / 2, jnp.eye(3, 4), w, h)
batch = {"image": jnp.full((h, w, 3), 0.4, jnp.float32)}

# Single-device baseline.
state = init_scene_train_state(store, jax.random.PRNGKey(0))
step1 = jax.jit(functools.partial(scene_train_step, config=cfg,
                                  render_config=rcfg, subset_accs=False))
state, m = step1(state, tracks, cam, batch)
jax.block_until_ready(m["loss"])
t0 = time.perf_counter()
for _ in range(15):
    state, m = step1(state, tracks, cam, batch)
jax.block_until_ready(m["loss"])
dt1 = (time.perf_counter() - t0) / 15
print(f"single-device step: {dt1 * 1e3:.1f} ms "
      f"loss={float(m['loss']):.4f}", flush=True)

# Sharded step on a (1, 1) mesh (same chip).
mesh = make_mesh(data=1, model=1)
state_s = place_state(init_scene_train_state(store, jax.random.PRNGKey(0)),
                      mesh)
steps = make_sharded_train_step(mesh, cfg, rcfg, w, h, cap_bg=cap,
                                subset_accs=False)
cam_b = stack_cameras([cam])
batch_b = stack_batches([batch], h, w)
with jax.set_mesh(mesh):
    state_s, ms = steps(state_s, tracks, cam_b, batch_b)
    jax.block_until_ready(ms["loss"])
    t0 = time.perf_counter()
    for _ in range(15):
        state_s, ms = steps(state_s, tracks, cam_b, batch_b)
    jax.block_until_ready(ms["loss"])
dt2 = (time.perf_counter() - t0) / 15
print(f"sharded (1,1) step: {dt2 * 1e3:.1f} ms "
      f"loss={float(ms['loss']):.4f} num_pairs={int(ms['num_pairs'])}",
      flush=True)
print(f"sharded overhead: {(dt2 / dt1 - 1) * 100:.1f}%", flush=True)
