import jax, jax.numpy as jnp, time
from street_gaussians_ns_tpu.ops.scan_pallas import cumsum_rows, cummax_rows

P = 4_456_448
N = 1_000_000
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (P,), 0, N, dtype=jnp.int32)
idxP = jax.random.randint(key, (P,), 0, P, dtype=jnp.int32)

def timeit(name, f, *a, iters=5):
    g = jax.jit(f)
    r = jax.block_until_ready(g(*a))
    t0=time.perf_counter()
    for _ in range(iters): r = g(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)
    return r

for wdt in (1, 4, 8, 16):
    tbl = jnp.ones((N, wdt), jnp.float32) if wdt > 1 else jnp.ones((N,), jnp.float32)
    timeit(f"gather N-table w={wdt}", lambda t, i: t[i], tbl, idx)

for wdt in (8, 16):
    tbl = jnp.ones((P, wdt), jnp.float32)
    timeit(f"gather P-table w={wdt}", lambda t, i: t[i], tbl, idxP)

# scatter of iota (inv construction)
timeit("scatter P int32", lambda i: jnp.zeros((P,), jnp.int32).at[i].set(jnp.arange(P, dtype=jnp.int32), mode="drop", unique_indices=True), idxP)

# cummax over (P, 6) int32: XLA vs pallas
x6 = jax.random.randint(key, (P, 6), 0, 1 << 30, dtype=jnp.int32)
timeit("xla cummax (P,6)i32", lambda x: jax.lax.cummax(x, axis=0), x6)
timeit("pallas cummax (P,6)i32", lambda x: cummax_rows(x), x6)
x8 = jnp.concatenate([x6, x6[:, :2]], axis=1)
timeit("pallas cummax (P,8)i32", lambda x: cummax_rows(x), x8)

xf = jax.random.normal(key, (P, 16))
timeit("pallas cumsum (P,16)f32", lambda x: cumsum_rows(x), xf)
timeit("xla cumsum (P,16)f32", lambda x: jnp.cumsum(x, axis=0), xf)

# sort cost scaling with payload columns
k = jax.random.randint(key, (P,), 0, 8192, dtype=jnp.int32)
pay = [jnp.arange(P, dtype=jnp.int32)]
timeit("sort key+1pay", lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=True), k, pay[0])
cols16 = tuple(jnp.ones((P,), jnp.float32) for _ in range(16))
timeit("sort key+1+16pay", lambda k, p, *c: jax.lax.sort((k, p) + c, num_keys=1, is_stable=True), k, pay[0], *cols16)
