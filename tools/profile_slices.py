"""Trace the depth-sliced fwd+bwd render step and summarize XLA op time.

Usage (TPU): python tools/profile_slices.py [k]
"""
import glob
import gzip
import json
import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import collections
import dataclasses

import jax
import jax.numpy as jnp

from bench import make_scene
from street_gaussians_ns_tpu.core.cameras import Camera
from street_gaussians_ns_tpu.ops.render import RenderConfig, render

TRACE = "/tmp/slice_trace"


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n, w, h = 1_000_000, 1600, 1056
    cfg = RenderConfig(max_pairs=3_407_872, max_rowruns=1_703_936,
                       impl="pallas", precision="bf16", depth_slices=k)
    means, scales, quats, opac, rgbs = make_scene(n)
    cam = Camera.make(1200.0, 1200.0, w / 2, h / 2, jnp.eye(3, 4), w, h)
    target = jnp.zeros((h, w, 3), jnp.float32)

    def loss_fn(means, scales, quats, opac, rgbs):
        out = render(means, scales, quats, opac, rgbs, cam, cfg)
        return jnp.mean(jnp.abs(out.rgb - target))

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    g = step(means, scales, quats, opac, rgbs)
    jax.block_until_ready(g)

    shutil.rmtree(TRACE, ignore_errors=True)
    iters = 10
    with jax.profiler.trace(TRACE):
        for _ in range(iters):
            g = step(means, scales, quats, opac, rgbs)
        jax.block_until_ready(g)

    path = sorted(glob.glob(TRACE + "/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    tid_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "XLA Ops" not in tid_names.get((e.get("pid"), e.get("tid")), ""):
            continue
        tot[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
    total = sum(tot.values())
    print(f"k={k}: total device {total / iters / 1e3:.2f} ms/step")
    for name, us in tot.most_common(28):
        print(f"{us / iters / 1e3:9.3f} ms  x{cnt[name] // iters:<4} {name[:90]}")


if __name__ == "__main__":
    main()
