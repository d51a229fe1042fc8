"""Microbench: candidate data-movement primitives for replacing the pair
sort (ops/tiles.py) with destination-known permutation movement.

Host timers over the axon tunnel are unreliable (see tools/profile_stages
docstring), so each candidate is traced with jax.profiler and scored by
total XLA-op device time / iterations.

Run on the real TPU chip: python tools/bench_scatter.py
"""
import sys, pathlib, shutil, glob, gzip, json, collections
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

MP = 3_407_872
ITERS = 10
TRACE_ROOT = "/tmp/scat_trace"


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
    jax.block_until_ready(g(*a))
    d = f"{TRACE_ROOT}/{name.replace(' ', '_').replace(',', '')}"
    shutil.rmtree(d, ignore_errors=True)
    jax.profiler.start_trace(d)
    r = None
    for _ in range(ITERS):
        r = g(*a)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    print(f"{name}: {device_ms(d):.3f} ms (device)", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, MP).astype(jnp.int32)
    cols11 = [jax.random.uniform(jax.random.fold_in(key, i), (MP,))
              for i in range(11)]
    tile_id = jax.random.randint(key, (MP,), 0, 6600, jnp.int32)
    rows16 = jax.random.uniform(key, (MP, 16), jnp.float32)

    bench("copy rows16 calib", lambda x: x * 1.000001, rows16)

    bench("sort key+11pay",
          lambda t, *cs: jax.lax.sort((t,) + cs, num_keys=1,
                                      is_stable=True), tile_id, *cols11)
    bench("sort key+1pay",
          lambda t, c: jax.lax.sort((t, c), num_keys=1, is_stable=True),
          tile_id, cols11[0])

    def scat_rows(p, r):
        return jnp.zeros(r.shape, r.dtype).at[p].set(
            r, unique_indices=True, mode="drop")

    bench("uscatter rows16", scat_rows, perm, rows16)
    bench("uscatter col", scat_rows, perm, cols11[0])

    def scat_11cols(p, *cs):
        return [jnp.zeros((MP,), jnp.float32).at[p].set(
            c, unique_indices=True, mode="drop") for c in cs]

    bench("uscatter 11cols", scat_11cols, perm, *cols11)

    bench("gather rows16", lambda r, p: jnp.take(
        r, p, axis=0, unique_indices=True), rows16, perm)
    bench("gather col", lambda c, p: jnp.take(
        c, p, unique_indices=True), cols11[0], perm)

    table = jnp.arange(6600, dtype=jnp.int32)
    bench("smalltable gather", lambda t, i: jnp.take(t, i), table, tile_id)

    skey = jnp.sort(tile_id)
    q = jnp.arange(6601, dtype=jnp.int32)
    bench("searchsorted 6601", lambda s, qq: jnp.searchsorted(s, qq),
          skey, q)


if __name__ == "__main__":
    main()
