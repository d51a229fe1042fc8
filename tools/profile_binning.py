"""Sub-stage TPU timings of the two-level row-adaptive binning at bench
scale. Run on a real TPU chip: `python tools/profile_binning.py`."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, time
from bench import make_scene
from street_gaussians_ns_tpu.core.cameras import Camera, viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import project, row_tile_range
from street_gaussians_ns_tpu.ops import tiles as tl
from street_gaussians_ns_tpu.ops.scan_pallas import cumsum_flat

n, w, h = 1_000_000, 1600, 1056
MP = 3_506_176
MR = 2_097_152
means, scales, quats, opac, rgbs = make_scene(n)
cam = Camera.make(1200., 1200., w/2, h/2, jnp.eye(3,4), w, h)
vm = viewmat_from_c2w(cam.c2w)
ntx=(w+15)//16; nty=(h+15)//16; T=ntx*nty
tile_size = 16


def timeit(name, f, *a, iters=5):
    g = jax.jit(f)
    r = jax.block_until_ready(g(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jax.block_until_ready(g(*a))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)
    return r

p = jax.jit(lambda m,s,q,v: project(m,s,q,v,cam.fx,cam.fy,cam.cx,cam.cy,w,h))(means, scales, quats, vm)
p = jax.block_until_ready(p)

visible = p.num_tiles_hit > 0
dk = jnp.where(visible, p.depths, jnp.inf)

def s_depth_sort(dk):
    return jax.lax.sort((dk, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
                        is_stable=True)[1]
order = timeit("depth_sort", s_depth_sort, dk)

tab = jnp.concatenate([
    p.xys, p.conics, p.tile_box.astype(jnp.float32),
    jnp.arange(n, dtype=jnp.float32)[:, None]], axis=-1)

tab_s = timeit("tab_gather(N,10)", lambda t, o: t[o], tab, order)
box_s = tab_s[:, 5:9].astype(jnp.int32)
hrows = jnp.where(visible[order], box_s[:, 3] - box_s[:, 2], 0)

cum_r = timeit("cumsum_flat(N)", cumsum_flat, hrows)
starts_r = cum_r - hrows

def s_owner1(starts_r, hrows):
    return jnp.clip(tl._owner_by_scatter(
        jnp.where(hrows > 0, starts_r, MR), MR, n), 0, n - 1)
owner1 = timeit("owner1(scatter+cummax MR)", s_owner1, starts_r, hrows)

rtab_full = jnp.concatenate([tab_s, starts_r.astype(jnp.float32)[:, None]], axis=-1)
rtab = timeit("rtab_gather(MR,11)", lambda t, o: t[o], rtab_full, owner1)

rr = jnp.arange(MR, dtype=jnp.int32)
rstart = rtab[:, 10].astype(jnp.int32)
rbox = rtab[:, 5:9].astype(jnp.int32)
ty = rbox[:, 2] + (rr - rstart)
rvalid = rr < jnp.minimum(cum_r[-1], MR)

def s_rowrange(rtab, ty, rvalid):
    x0r, x1r = row_tile_range(rtab[:, 2:5], rtab[:, 0:2], rbox, ty, tile_size)
    return x0r, jnp.where(rvalid, x1r - x0r, 0)
x0r, wr = timeit("row_tile_range(MR)", s_rowrange, rtab, ty, rvalid)

cum2 = timeit("cumsum_flat(MR)", cumsum_flat, wr)
starts2 = cum2 - wr
total = cum2[-1]

def s_owner2(starts2, wr):
    return jnp.clip(tl._owner_by_scatter(
        jnp.where(wr > 0, starts2, MP), MP, MR), 0, MR - 1)
owner2 = timeit("owner2(scatter+cummax MP)", s_owner2, starts2, wr)

rtab_i = jnp.stack([rtab[:, 9].astype(jnp.int32), ty * ntx + x0r, starts2], -1)
ptab = timeit("ptab_gather(MP,3)", lambda t, o: t[o], rtab_i, owner2)

slot = jnp.arange(MP, dtype=jnp.int32)
valid = slot < total
tile_id = jnp.where(valid, ptab[:, 1] + (slot - ptab[:, 2]), T)

def s_pair_sort(tile_id, slot):
    return jax.lax.sort((tile_id, slot), num_keys=1, is_stable=True)
tid_s, slot_s = timeit("pair_sort(MP)", s_pair_sort, tile_id, slot)

def s_counts(starts_r, hrows, cum2, starts2):
    in_cap = (hrows > 0) & (starts_r < MR)
    last_r = jnp.clip(starts_r + hrows - 1, 0, MR - 1)
    count_g = jnp.where(
        in_cap, cum2[last_r] - starts2[jnp.clip(starts_r, 0, MR - 1)], 0)
    return cumsum_flat(count_g) - count_g
timeit("per-rank counts", s_counts, starts_r, hrows, cum2, starts2)

def s_tilestart(tid_s):
    seg = jnp.searchsorted(tid_s, jnp.arange(T + 1, dtype=jnp.int32))
    return seg
timeit("searchsorted tile_start", s_tilestart, tid_s)
print("total pairs:", int(total), "rowruns:", int(jnp.minimum(cum_r[-1], MR)))
