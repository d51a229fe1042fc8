"""Trace scene_refine_step at 1M capacity — find the XLA pathology behind
its ~800 ms (amortizes /100, but that is still 8 ms/step and the sharded
path runs it under GSPMD). Run solo on the TPU."""
import sys, pathlib, shutil, glob, gzip, json, collections
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import functools
import jax
import jax.numpy as jnp

from bench_train import scene_cfg, store_from_scene
from street_gaussians_ns_tpu.engine.scene_train_step import (
    init_scene_train_state, scene_refine_step)
from street_gaussians_ns_tpu.models.scene_graph import empty_tracks, \
    init_scene_graph_store

ITERS = 5
D = "/tmp/refine_trace"

cfg = scene_cfg()
bg = store_from_scene(1_000_000, 1_048_576)
obj = jax.tree.map(lambda x: x[None][:0], bg)
tracks = empty_tracks(num_objects=0, num_frames=2)
store = init_scene_graph_store(bg, obj, tracks, cfg)
state = init_scene_train_state(store, jax.random.PRNGKey(0))

refine = jax.jit(functools.partial(scene_refine_step, config=cfg,
                                   num_train_data=1))
state2, info = refine(state, max_hw=jnp.float32(1600.0))
jax.block_until_ready(state2.step)
print("compiled", flush=True)

shutil.rmtree(D, ignore_errors=True)
jax.profiler.start_trace(D)
s = state
for _ in range(ITERS):
    s, info = refine(s, max_hw=jnp.float32(1600.0))
jax.block_until_ready(s.step)
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
print(f"total {sum(tot.values()) / 1e3 / ITERS:.1f} ms/refine over "
      f"{len(tot)} ops", flush=True)
for name, us in tot.most_common(25):
    print(f"{us / 1e3 / ITERS:9.2f} ms  {name[:110]}", flush=True)
