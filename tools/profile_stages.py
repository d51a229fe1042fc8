"""Per-stage TPU timings of the differentiable render step at bench scale.

Run on a real TPU chip: `python tools/profile_stages.py`.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, time
from bench import make_scene
from street_gaussians_ns_tpu.core.cameras import Camera, viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import project
from street_gaussians_ns_tpu.ops import tiles as tl
from street_gaussians_ns_tpu.ops import composite_pallas as cp
from street_gaussians_ns_tpu.ops.scan_pallas import cumsum_rows

n, w, h = 1_000_000, 1600, 1056
MP = 3_506_176
MR = 2_097_152
means, scales, quats, opac, rgbs = make_scene(n)
cam = Camera.make(1200., 1200., w/2, h/2, jnp.eye(3,4), w, h)
vm = viewmat_from_c2w(cam.c2w)
ntx=(w+15)//16; nty=(h+15)//16; T=ntx*nty
K = cp.K

def timeit(name, f, *a, iters=5):
    g = jax.jit(f)
    r = jax.block_until_ready(g(*a))
    t0=time.perf_counter()
    for _ in range(iters): r = g(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)
    return r

p = timeit("project", lambda m,s,q,v: project(m,s,q,v,cam.fx,cam.fy,cam.cx,cam.cy,w,h), means, scales, quats, vm)
bins = timeit("bin_gaussians", lambda p: tl.bin_gaussians(p, w, h, 16, MP, MR), p)
print("  true pairs:", int(bins.num_pairs), " rowruns:", int((jnp.where(p.num_tiles_hit>0, p.tile_box[:,3]-p.tile_box[:,2], 0)).sum()), flush=True)

colors4 = jnp.concatenate([rgbs, p.depths[:,None]], -1)
feat = timeit("build_feat", lambda: cp._build_feat(p.xys, p.conics, colors4, opac, bins))
out = timeit("fwd_kernel", lambda f: cp._fwd_call(f, bins.tile_start, bins.tile_count, ntx, T, 4), feat)
accum, tfin, ncon = out

g_accum = jnp.ones((T, 4, cp.PIX), jnp.float32)
aux = jnp.ones((T, 4, cp.PIX), jnp.float32)
nchunks_bwd = jnp.minimum((bins.tile_count + K - 1) // K,
                          (jnp.max(ncon, axis=1) + K - 1) // K).astype(jnp.int32)
gpair = timeit("bwd_kernel", lambda f, ga, au: cp._bwd_call(
    f, bins.tile_start, bins.tile_count, nchunks_bwd, MP // K + 1, ntx, T, 4,
    ga, au), feat, g_accum, aux)
timeit("reduce_total", lambda g: cp._reduce_pair_grads(g, bins, n), gpair)

# reduce sub-stages
inv = timeit("  argsort", lambda es: jax.lax.sort(
    (es, jnp.arange(MP, dtype=jnp.int32)), num_keys=1, is_stable=True)[1],
    bins.exp_slot)
flat = timeit("  out_transpose", lambda g: g.reshape(-1, cp.NFEAT, K).transpose(0, 2, 1).reshape(-1, cp.NFEAT)[:MP], gpair)
rows = timeit("  rows_gather", lambda f, i: f[i], flat, inv)
pref = timeit("  pallas_cumsum", lambda x: cumsum_rows(x), rows)
def bounds(prefix, st, cn, do):
    en = jnp.clip(st + cn, 0, MP)
    hi = jnp.where((en > 0)[:, None], prefix[jnp.clip(en - 1, 0, MP - 1)], 0.0)
    lo = jnp.concatenate([jnp.zeros((1, 16), hi.dtype), hi[:-1]])
    rk = jnp.where((cn > 0)[:, None], hi - lo, 0.0)
    ir = jnp.zeros((n,), jnp.int32).at[do].set(jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    return rk[ir]
timeit("  bounds+unperm", bounds, pref, bins.exp_starts, bins.exp_counts, bins.depth_order)
