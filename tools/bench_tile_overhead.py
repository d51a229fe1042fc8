"""Per-tile fixed-cost floor of the composite kernels: run fwd/bwd over
the bench tile grid with ALL tiles empty (counts=0) — any device time is
pure grid-step + state-init + IO overhead, no chunk work."""
import sys, pathlib, shutil, glob, gzip, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from street_gaussians_ns_tpu.ops import composite_pallas as cp

w, h = 1600, 1056
MP = 3_407_872
ntx, nty = 100, 66
T = ntx * nty
ITERS = 10
ROOT = "/tmp/tile_ovh"


def device_ms(trace_dir):
    cands = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(cands)[-1], "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    tid = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid[(e["pid"], e["tid"])] = e["args"].get("name", "")
    tot = sum(e.get("dur", 0) for e in ev if e.get("ph") == "X"
              and "XLA Ops" in tid.get((e.get("pid"), e.get("tid")), ""))
    return tot / 1e3 / ITERS


def bench(name, f, *a):
    g = jax.jit(f)
    jax.block_until_ready(g(*a))
    d = f"{ROOT}/{name}"
    shutil.rmtree(d, ignore_errors=True)
    jax.profiler.start_trace(d)
    r = None
    for _ in range(ITERS):
        r = g(*a)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    print(f"{name}: {device_ms(d):.2f} ms", flush=True)


feat = jnp.zeros((MP // cp.K + 1, cp.NFEAT, cp.K), jnp.float32)
starts = jnp.zeros((T,), jnp.int32)
zcounts = jnp.zeros((T,), jnp.int32)

bench("fwd_empty", lambda f, s, c: cp._fwd_call(f, s, c, ntx, T, 4),
      feat, starts, zcounts)

gaux = jnp.zeros((T, 8, cp.PIX), jnp.float32)
nbwd = jnp.zeros((T,), jnp.int32)
bench("bwd_empty", lambda f, s, c, nb, ga: cp._bwd_call(
    f, s, c, nb, MP // cp.K + 1, ntx, T, 4, ga, with_rank=True),
    feat, starts, zcounts, nbwd, gaux)

# One-chunk-per-tile: 6600 x 128 pairs — isolates per-chunk+per-tile cost
# at minimal chunk count.
counts1 = jnp.full((T,), cp.K, jnp.int32)
starts1 = jnp.arange(T, dtype=jnp.int32) * cp.K
bench("fwd_1chunk", lambda f, s, c: cp._fwd_call(f, s, c, ntx, T, 4),
      feat, starts1, counts1)
nbwd1 = jnp.ones((T,), jnp.int32)
bench("bwd_1chunk", lambda f, s, c, nb, ga: cp._bwd_call(
    f, s, c, nb, MP // cp.K + 1, ntx, T, 4, ga, with_rank=True),
    feat, starts1, counts1, nbwd1, gaux)
