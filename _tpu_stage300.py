import jax, jax.numpy as jnp, time
from bench import make_scene
from street_gaussians_ns_tpu.core.cameras import Camera, viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import project
from street_gaussians_ns_tpu.ops.tiles import bin_gaussians, align_bins
from street_gaussians_ns_tpu.ops import composite_pallas as cp

n, w, h = 300_000, 800, 608
MP = 2**21
means, scales, quats, opac, rgbs = make_scene(n)
cam = Camera.make(600., 600., w/2, h/2, jnp.eye(3,4), w, h)
vm = viewmat_from_c2w(cam.c2w)
p = jax.block_until_ready(jax.jit(lambda: project(means, scales, quats, vm, cam.fx, cam.fy, cam.cx, cam.cy, w, h))())
print("project ok", flush=True)
bins = jax.block_until_ready(jax.jit(lambda: bin_gaussians(p, w, h, 16, MP))())
print("bin ok, true pairs:", int(bins.num_pairs), "max count:", int(bins.tile_count.max()), flush=True)
abins = jax.block_until_ready(jax.jit(lambda: align_bins(bins, 128))())
print("align ok, max aligned count:", int(abins.tile_count.max()), flush=True)
colors4 = jnp.concatenate([rgbs, p.depths[:,None]], -1)
feat = jax.block_until_ready(jax.jit(lambda: cp._build_feat(p.xys, p.conics, colors4, opac, abins))())
print("feat ok rows:", feat.shape, flush=True)
row0 = abins.tile_start // cp.K
nch = abins.tile_count // cp.K
ntx = (w+15)//16; nty=(h+15)//16
print("max chunks:", int(nch.max()), "sum:", int(nch.sum()), flush=True)
accum, tfin, ncon = jax.block_until_ready(jax.jit(lambda: cp._fwd_call(feat, row0, nch, ntx, ntx*nty, 4))())
print("fwd kernel ok, ncon max:", int(ncon.max()), flush=True)
