"""Sub-stage TPU timings of the FUSED bin_and_pack path at bench scale.

Each stage is jitted standalone with its inputs materialized, so the
number is that stage's cost when it cannot fuse into neighbors — an
upper bound per stage, but the right granularity for finding the fat.
Run on a real TPU chip: `python tools/profile_fused_binning.py`.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time

import jax
import jax.numpy as jnp

from bench import make_scene
from street_gaussians_ns_tpu.core.cameras import Camera, viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import (
    project, row_tile_range, coverage_q)
from street_gaussians_ns_tpu.ops import tiles as tl
from street_gaussians_ns_tpu.ops.expand_pallas import expand_ragged
from street_gaussians_ns_tpu.ops.scan_pallas import cumsum_flat

n, w, h = 1_000_000, 1600, 1056
MP = 3_407_872
MR = 1_703_936
tile_size = 16
ntx = (w + 15) // 16
nty = (h + 15) // 16
T = ntx * nty


def timeit(name, f, *a, iters=10):
    g = jax.jit(f)
    r = jax.block_until_ready(g(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = g(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.2f} ms",
          flush=True)
    return r


means, scales, quats, opac, rgbs = make_scene(n)
cam = Camera.make(1200.0, 1200.0, w / 2, h / 2, jnp.eye(3, 4), w, h)
vm = viewmat_from_c2w(cam.c2w)
p = jax.jit(lambda m, s, q, v, o: project(
    m, s, q, v, cam.fx, cam.fy, cam.cx, cam.cy, w, h,
    tile_size=tile_size, opacities=o))(means, scales, quats, vm, opac)
p = jax.block_until_ready(p)

colors = jnp.concatenate([rgbs, p.depths[:, None]], axis=-1)
depth_key = jnp.where(p.num_tiles_hit > 0, p.depths, jnp.inf)
tile_box = p.tile_box.astype(jnp.int32)
nc = 4
nc_ride = 3

# --- stage 1: depth sort with payload columns -------------------------------
def s_depth_sort(depth_key, xys, conics, opacities, colors, tile_box):
    box_col = ((tile_box[:, 0] << 24) | (tile_box[:, 1] << 16)
               | (tile_box[:, 2] << 8) | tile_box[:, 3])
    cols = (
        jnp.arange(n, dtype=jnp.int32),
        xys[:, 0], xys[:, 1],
        conics[:, 0], conics[:, 1], conics[:, 2],
        opacities.astype(jnp.float32),
        *(colors[:, i].astype(jnp.float32) for i in range(nc_ride)),
        box_col,
    )
    return jax.lax.sort((depth_key,) + cols, num_keys=1, is_stable=True)

outs = timeit("depth_sort(N,11pay)", s_depth_sort, depth_key, p.xys,
              p.conics, opac, colors, tile_box)
dk_s, idx_s, x_s, y_s, ca_s, cb_s, cc_s, op_s, f0_s, f1_s, f2_s, bx = outs
x0_s = (bx >> 24) & 0xFF
x1_s = (bx >> 16) & 0xFF
y0_s = (bx >> 8) & 0xFF
y1_s = bx & 0xFF
f3_s = dk_s

# --- stage 2: row trim ------------------------------------------------------
def s_row_trim(ca, cb, cc, x, y, x0, x1, y0, y1, op):
    box_s = jnp.stack([x0, x1, y0, y1], axis=-1)
    return tl._row_trim_counts(
        jnp.stack([ca, cb, cc], axis=-1), jnp.stack([x, y], axis=-1),
        box_s, tile_size, nty, q=coverage_q(op))

first, last, count_g = timeit(
    "row_trim(N x 66)", s_row_trim, ca_s, cb_s, cc_s, x_s, y_s,
    x0_s, x1_s, y0_s, y1_s, op_s)
nzm = jnp.isfinite(dk_s) & (count_g > 0)
y0t = jnp.where(nzm, y0_s + first, 0)
y1t = jnp.where(nzm, y0_s + last + 1, 0)
hrows = jnp.where(nzm, y1t - y0t, 0)

# --- stage 3: level-1 expansion --------------------------------------------
cum_r = timeit("cumsum_flat(N)", cumsum_flat, hrows)
starts_r = cum_r - hrows
ident = jnp.arange(n, dtype=jnp.int32).astype(jnp.float32)
src16 = jnp.stack([
    x_s, y_s, ca_s, cb_s, cc_s, op_s, f0_s, f1_s, f2_s, f3_s,
    x0_s.astype(jnp.float32), x1_s.astype(jnp.float32),
    y0t.astype(jnp.float32), y1t.astype(jnp.float32),
    ident, starts_r.astype(jnp.float32),
])
r = timeit("expand1(16,N->MR)", lambda s, a, b: expand_ragged(s, a, b, MR),
           src16, starts_r, cum_r)

# --- stage 4: row ranges + level-2 expansion --------------------------------
def s_rowrange(r):
    rr = jnp.arange(MR, dtype=jnp.int32)
    rstart = r[15].astype(jnp.int32)
    ty = r[12].astype(jnp.int32) + (rr - rstart)
    rbox = jnp.stack([r[10], r[11], r[12], r[13]], -1).astype(jnp.int32)
    rvalid = rr < jnp.minimum(cum_r[-1], MR)
    x0r, x1r = row_tile_range(
        jnp.stack([r[2], r[3], r[4]], -1), jnp.stack([r[0], r[1]], -1),
        rbox, ty, tile_size, coverage_q(r[5]))
    return ty, x0r, jnp.where(rvalid, x1r - x0r, 0)

ty, x0r, wr = timeit("row_tile_range(MR)", s_rowrange, r)
cum2 = timeit("cumsum_flat(MR)", cumsum_flat, wr)
starts2 = cum2 - wr
total = cum2[-1]
print("true pairs:", int(total), "rowruns:", int(cum_r[-1]), flush=True)

src14 = jnp.concatenate([
    r[0:10], r[14][None],
    (ty * ntx + x0r).astype(jnp.float32)[None],
    starts2.astype(jnp.float32)[None],
    jnp.ones((1, MR), jnp.float32),
])
pp = timeit("expand2(14,MR->MP)", lambda s, a, b: expand_ragged(s, a, b, MP),
            src14, starts2, cum2)

# --- stage 5: pair sort -----------------------------------------------------
slot = jnp.arange(MP, dtype=jnp.int32)
hit = pp[13] > 0.5
valid = (slot < total) & hit
tile_id = jnp.where(
    valid, pp[11].astype(jnp.int32) + (slot - pp[12].astype(jnp.int32)), T)
rank_col = jnp.where(valid, pp[10], jnp.float32(n))

def s_pair_sort(tile_id, pp, rank_col):
    return jax.lax.sort(
        (tile_id,) + tuple(pp[i] for i in range(10)) + (rank_col,),
        num_keys=1, is_stable=True)

sorted_cols = timeit("pair_sort(MP,11pay)", s_pair_sort, tile_id, pp,
                     rank_col)
tile_sorted = sorted_cols[0]

def s_pair_sort_thin(tile_id, rank_col):
    return jax.lax.sort((tile_id, rank_col), num_keys=1, is_stable=True)

timeit("pair_sort(MP,1pay)", s_pair_sort_thin, tile_id, rank_col)

# --- stage 6: tile bounds ---------------------------------------------------
def s_bounds(tile_sorted):
    tids = jnp.arange(T + 1, dtype=jnp.int32)
    return jnp.searchsorted(tile_sorted, tids, side="left").astype(jnp.int32)

timeit("searchsorted(T+1)", s_bounds, tile_sorted)

# --- reference: full fused call --------------------------------------------
def s_full(xys, conics, tile_box, depth_key, colors, opacities):
    return tl.bin_and_pack(xys, conics, tile_box, depth_key, colors,
                           opacities, w, h, tile_size, MP, MR,
                           with_gauss_idx=False, last_color_is_depth=True)

timeit("bin_and_pack FULL", s_full, p.xys, p.conics, tile_box, depth_key,
       colors, opac)
