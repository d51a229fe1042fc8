"""Trace the FULL scene_train_step at bench scale and print the top XLA
ops — finds where the ~145 ms beyond the raw render step goes (SSIM conv?
sky cubemap gathers? Adam?). Run solo on the TPU."""
import sys, pathlib, shutil, glob, gzip, json, collections
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

ITERS = 6
D = "/tmp/train_step_trace"

cfg = scene_cfg()
n, cap, w, h = 1_000_000, 1_048_576, 1600, 1056
bg = store_from_scene(n, cap)
obj = jax.tree.map(lambda x: x[None][:0], bg)
tracks = empty_tracks(num_objects=0, num_frames=2)
store = init_scene_graph_store(bg, obj, tracks, cfg)
state = init_scene_train_state(store, jax.random.PRNGKey(0))
rcfg = RenderConfig(max_pairs=3_407_872, max_rowruns=1_703_936,
                    impl="pallas", precision="bf16")
cam = Camera.make(1200.0, 1200.0, w / 2, h / 2, jnp.eye(3, 4), w, h)
batch = {"image": jnp.full((h, w, 3), 0.4, jnp.float32)}

step = jax.jit(functools.partial(scene_train_step, config=cfg,
                                 render_config=rcfg, subset_accs=False))
state, m = step(state, tracks, cam, batch)
jax.block_until_ready(m["loss"])
print("compiled", flush=True)

shutil.rmtree(D, ignore_errors=True)
jax.profiler.start_trace(D)
for _ in range(ITERS):
    state, m = step(state, tracks, cam, batch)
jax.block_until_ready(m["loss"])
jax.profiler.stop_trace()

path = sorted(glob.glob(D + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(path, "rt") as f:
    data = json.load(f)
ev = data["traceEvents"]
tid = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tid[(e["pid"], e["tid"])] = e["args"].get("name", "")
tot = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and "XLA Ops" in tid.get(
            (e.get("pid"), e.get("tid")), ""):
        tot[e["name"]] += e.get("dur", 0)
print(f"total {sum(tot.values()) / 1e3 / ITERS:.1f} ms/step over "
      f"{len(tot)} ops", flush=True)
for name, us in tot.most_common(35):
    print(f"{us / 1e3 / ITERS:9.2f} ms  {name[:110]}", flush=True)
