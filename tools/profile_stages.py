import jax, jax.numpy as jnp, time, functools
from bench import make_scene
from street_gaussians_ns_tpu.core.cameras import Camera, viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import project
from street_gaussians_ns_tpu.ops import tiles as tl
from street_gaussians_ns_tpu.ops import composite_pallas as cp

n, w, h = 1_000_000, 1600, 1056
MP = 4_456_448
means, scales, quats, opac, rgbs = make_scene(n)
cam = Camera.make(1200., 1200., w/2, h/2, jnp.eye(3,4), w, h)
vm = viewmat_from_c2w(cam.c2w)
ntx=(w+15)//16; nty=(h+15)//16; T=ntx*nty

def timeit(name, f, *a, iters=5):
    g = jax.jit(f)
    r = jax.block_until_ready(g(*a))
    t0=time.perf_counter()
    for _ in range(iters): r = g(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)
    return r

# stage 1: projection
p = timeit("project", lambda m,s,q,v: project(m,s,q,v,cam.fx,cam.fy,cam.cx,cam.cy,w,h), means, scales, quats, vm)

# stage 2: binning total
bins = timeit("bin_gaussians", lambda p: tl.bin_gaussians(p, w, h, 16, MP), p)

# binning sub-stages
def sub_depth_sort(p):
    nn = p.depths.shape[0]
    visible = p.num_tiles_hit > 0
    dk = jnp.where(visible, p.depths, jnp.inf)
    return jax.lax.sort((dk, jnp.arange(nn, dtype=jnp.int32)), num_keys=1, is_stable=True)
timeit("  depth_sort(N)", sub_depth_sort, p)

def sub_expand(p):
    nn = p.depths.shape[0]
    visible = p.num_tiles_hit > 0
    dk = jnp.where(visible, p.depths, jnp.inf)
    _, order = jax.lax.sort((dk, jnp.arange(nn, dtype=jnp.int32)), num_keys=1, is_stable=True)
    counts = p.num_tiles_hit[order].astype(jnp.int32)
    cum = jnp.cumsum(counts); total = cum[-1]; starts = cum - counts
    slot = jnp.arange(MP, dtype=jnp.int32)
    valid = slot < total
    box_s = p.tile_box[order]
    b0 = box_s[:, 2] * ntx + box_s[:, 0]
    bw = jnp.maximum(box_s[:, 1] - box_s[:, 0], 1)
    start_sent = jnp.where(counts > 0, starts, MP)
    n_bits = max(int(max(nn - 1, 1)).bit_length(), 1)
    p_bits = max(int(MP).bit_length(), 1)
    t_bits = max(int(T).bit_length(), 1)
    g_b, start_b, b0_b, w_b = tl.segment_broadcast([order, starts, b0, bw], [n_bits, p_bits, t_bits, 8], start_sent, MP)
    local = slot - start_b
    tile_id = b0_b + local % w_b + (local // w_b) * ntx
    tile_id = jnp.where(valid, tile_id, T)
    return tile_id, g_b
tile_id, g_b = timeit("  expand(seg_bcast)", sub_expand, p)

slot = jnp.arange(MP, dtype=jnp.int32)
timeit("  pair_sort(P)", lambda t: jax.lax.sort((t, slot), num_keys=1, is_stable=True), tile_id)

# stage 3: feature build (the sorted-order gather + pack)
colors4 = jnp.concatenate([rgbs, p.depths[:,None]], -1)
feat = timeit("build_feat", lambda: cp._build_feat(p.xys, p.conics, colors4, opac, bins))

# stage 4: fwd kernel
out = timeit("fwd_kernel", lambda f: cp._fwd_call(f, bins.tile_start, bins.tile_count, ntx, T, 4), feat)
accum, tfin, ncon = out

# stage 5: bwd kernel
import numpy as np
new_start, padded = tl.align_bins(bins, cp.K)
cap = MP + T * cp.K
g_accum = jnp.ones((T, 4, cp.PIX), jnp.float32)
aux = jnp.ones((T, 4, cp.PIX), jnp.float32)
nchunks = padded // cp.K
nchunks_bwd = jnp.minimum(nchunks, (jnp.max(ncon, axis=1) + cp.K - 1) // cp.K).astype(jnp.int32)
gpair = timeit("bwd_kernel", lambda f, ga, au: cp._bwd_call(f, bins.tile_start, bins.tile_count, new_start//cp.K, nchunks_bwd, cap//cp.K, ntx, T, 4, ga, au), feat, g_accum, aux)

# stage 6: reduce pair grads
gpr = gpair.transpose(0, 2, 1).reshape(-1, cp.NFEAT)
timeit("reduce_pair_grads", lambda g: cp._reduce_pair_grads(g, bins, n), gpr)
