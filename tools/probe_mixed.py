"""Probe: would a row-group mixed-tile compositor (no pair sort) do more
or less work than the per-tile kernel?

Per-tile kernel work  = sum_t ceil(ncon_max_t / 128) chunks (bwd; fwd
similar until all-pixels-done).
Mixed kernel work     = sum_g ceil(frac_g * len_g / 128) where frac_g is
the stream fraction until the LAST tile of group g saturates; pairs of a
tile are ~uniformly interleaved in the group stream, so a tile's k-th
pair sits at ~k/count_t of the stream.

Also reports the gaussian-copy factor for row-group bucketing (a gaussian
is copied into every row-group its tile box overlaps).
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_scene
from street_gaussians_ns_tpu.core.cameras import Camera, viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import project
from street_gaussians_ns_tpu.ops import composite_pallas as cp
from street_gaussians_ns_tpu.ops import tiles as tl

n, w, h = 1_000_000, 1600, 1056
MP = 3_407_872
MR = 1_703_936
K = cp.K
ntx, nty = (w + 15) // 16, (h + 15) // 16
T = ntx * nty

means, scales, quats, opac, rgbs = make_scene(n)
cam = Camera.make(1200.0, 1200.0, w / 2, h / 2, jnp.eye(3, 4), w, h)
vm = viewmat_from_c2w(cam.c2w)

p = jax.jit(lambda m, s, q, o: project(
    m, s, q, vm, cam.fx, cam.fy, cam.cx, cam.cy, w, h, opacities=o))(
    means, scales, quats, opac)
colors4 = jnp.concatenate([rgbs, p.depths[:, None]], -1)
dk = jnp.where(p.num_tiles_hit > 0, p.depths, jnp.inf)


def run(xys, con, tbx, dkv, c4, op):
    bins, feats = tl.bin_and_pack(xys, con, tbx, dkv, c4, op, w, h, 16,
                                  MP, MR, with_gauss_idx=False,
                                  last_color_is_depth=True)
    feat = cp._pack_feat_cols(feats, MP)
    accum, tfin, ncon = cp._fwd_call(feat, bins.tile_start,
                                     bins.tile_count, ntx, T, 4)
    return bins.tile_count, ncon


tile_count, ncon = jax.block_until_ready(jax.jit(run)(
    p.xys, p.conics, p.tile_box.astype(jnp.int32), dk, colors4, opac))
tile_count = np.asarray(tile_count).astype(np.int64)     # (T,)
ncon_max = np.asarray(jnp.max(ncon, axis=1)).astype(np.int64)  # (T,)

frac_t = np.where(tile_count > 0, ncon_max / np.maximum(tile_count, 1), 0.0)
per_tile_chunks = np.ceil(ncon_max / K).sum()
all_chunks = np.ceil(tile_count / K).sum()

print(f"pairs total {tile_count.sum()}  tiles {T}")
print(f"per-tile bwd chunks {per_tile_chunks:.0f} "
      f"(vs untrimmed {all_chunks:.0f}, frac "
      f"{per_tile_chunks / all_chunks:.3f})")
print(f"tile saturation frac: mean {frac_t[tile_count > 0].mean():.3f} "
      f"p50 {np.median(frac_t[tile_count > 0]):.3f} "
      f"p90 {np.percentile(frac_t[tile_count > 0], 90):.3f}")

tc2 = tile_count.reshape(nty, ntx)
fr2 = frac_t.reshape(nty, ntx)
for rows_per_group in (1, 2, 4, 8):
    ng = (nty + rows_per_group - 1) // rows_per_group
    mixed = 0.0
    for g in range(ng):
        sl = slice(g * rows_per_group, (g + 1) * rows_per_group)
        len_g = tc2[sl].sum()
        frac_g = fr2[sl].max() if len_g > 0 else 0.0
        mixed += np.ceil(frac_g * len_g / K)
    print(f"group={rows_per_group} rows: mixed chunks {mixed:.0f} "
          f"({mixed / per_tile_chunks:.2f}x per-tile)")

# Gaussian copy factor for row-group bucketing.
box = np.asarray(p.tile_box).astype(np.int64)
vis = np.asarray(p.num_tiles_hit) > 0
y0, y1 = box[vis, 2], box[vis, 3]
for rows_per_group in (2, 4, 8):
    g0 = y0 // rows_per_group
    g1 = (np.maximum(y1, y0 + 1) - 1) // rows_per_group
    copies = (g1 - g0 + 1).sum()
    print(f"group={rows_per_group}: gaussian copies {copies} "
          f"({copies / vis.sum():.2f}x of {vis.sum()} visible)")
