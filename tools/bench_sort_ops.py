"""Probe lax.sort cost structure on the real TPU (round 4).

Questions (device-time via jax.profiler traces, same harness as
tools/bench_scatter.py — host timers over the axon tunnel lie):

  1. per-operand slope/intercept of `lax.sort` at bench scale (4.2M
     rows): key + k int32 payloads, k in {1, 3, 5, 7, 9};
  2. do int64-packed payloads (2 int32 per operand) move the same bytes
     cheaper (operand-count- vs byte-dominated)?
  3. is an int64 KEY viable ((tile << 21 | rank) would drop the rank
     payload from the production pair sort)?
  4. batched (B, n/B) row sort vs flat (smaller log^2 n);
  5. stable vs unstable at k=5.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_sort_ops.py
"""
import glob
import gzip
import json
import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_enable_x64", True)   # for the i64 probes

import jax.numpy as jnp

N = 1 << 22          # 4.19M rows (bench-scale pair capacity)
ITERS = 8
TRACE_ROOT = "/tmp/sort_trace"
RESULTS = {}


def device_ms(trace_dir):
    cands = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not cands:
        return float("nan")
    with gzip.open(sorted(cands)[-1], "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    tid_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    tot = 0.0
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "XLA Ops" not in tid_names.get((e.get("pid"), e.get("tid")), ""):
            continue
        tot += e.get("dur", 0)
    return tot / 1e3 / ITERS


def bench(name, f, *a):
    g = jax.jit(f)
    try:
        jax.block_until_ready(g(*a))
    except Exception as e:  # pragma: no cover
        print(f"{name}: FAILED {e!r}", flush=True)
        return
    d = f"{TRACE_ROOT}/{name.replace(' ', '_').replace(',', '')}"
    shutil.rmtree(d, ignore_errors=True)
    jax.profiler.start_trace(d)
    r = None
    for _ in range(ITERS):
        r = g(*a)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    ms = device_ms(d)
    RESULTS[name] = ms
    print(f"{name}: {ms:.3f} ms (device)", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    keys32 = jax.random.randint(key, (N,), 0, 6600, dtype=jnp.int32)
    payload = [jax.random.randint(jax.random.PRNGKey(i + 1), (N,),
                                  0, 1 << 30, dtype=jnp.int32)
               for i in range(10)]

    def sort_stable(kk, *ps):
        return jax.lax.sort((kk,) + ps, num_keys=1, is_stable=True)

    def sort_unstable(kk, *ps):
        return jax.lax.sort((kk,) + ps, num_keys=1, is_stable=False)

    for k in (1, 3, 5, 7, 9):
        bench(f"i32 key+{k} stable", sort_stable, keys32, *payload[:k])

    bench("i32 key+5 unstable", sort_unstable, keys32, *payload[:5])

    # i64 payloads: 3 x i64 vs the 6 x i32 they pack.
    p64 = [((payload[2 * i].astype(jnp.int64) << 32)
            | payload[2 * i + 1].astype(jnp.uint32).astype(jnp.int64))
           for i in range(3)]
    bench("i32 key+3xi64 (=6 cols)", sort_stable, keys32, *p64)
    bench("i32 key+6 stable", sort_stable, keys32, *payload[:6])

    # i64 key (tile << 21 | rank).
    key64 = ((keys32.astype(jnp.int64) << 21)
             | jax.random.randint(jax.random.PRNGKey(99), (N,), 0, 1 << 20
                                  ).astype(jnp.int64))
    bench("i64 KEY +5 i32", sort_stable, key64, *payload[:5])
    bench("i64 KEY +3xi64", sort_stable, key64, *p64)

    # batched rows (smaller log^2 n per row).
    for b in (8, 64):
        kb = keys32.reshape(b, N // b)
        pb = [p.reshape(b, N // b) for p in payload[:5]]

        def sort_batched(kk, *ps):
            return jax.lax.sort((kk,) + ps, num_keys=1, dimension=1,
                                is_stable=True)

        bench(f"batched{b} key+5", sort_batched, kb, *pb)

    # smaller flat sorts (the depth-sliced per-shard scaling curve).
    for frac in (2, 4, 8):
        n2 = N // frac
        bench(f"i32 key+5 at N/{frac}", sort_stable, keys32[:n2],
              *[p[:n2] for p in payload[:5]])

    with open("/tmp/sort_probe.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
