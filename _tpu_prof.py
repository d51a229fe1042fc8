import jax, jax.numpy as jnp, time
from bench import make_scene
from street_gaussians_ns_tpu.core.cameras import Camera, viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import project
from street_gaussians_ns_tpu.ops.tiles import bin_gaussians, align_bins
from street_gaussians_ns_tpu.ops import composite_pallas as cp
from street_gaussians_ns_tpu.ops.composite_chunked import rasterize_tiles_chunked

n, w, h = 100_000, 800, 608
MP = 2**20
means, scales, quats, opac, rgbs = make_scene(n)
cam = Camera.make(600., 600., w/2, h/2, jnp.eye(3,4), w, h)
vm = viewmat_from_c2w(cam.c2w)

def timeit(name, f, iters=5):
    r = jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)
    return r

proj_f = jax.jit(lambda: project(means, scales, quats, vm, cam.fx, cam.fy, cam.cx, cam.cy, w, h))
p = timeit("project", proj_f)
bin_f = jax.jit(lambda: bin_gaussians(p, w, h, 16, MP))
bins = timeit("bin(sort)", bin_f)
print("true pairs:", int(bins.num_pairs), flush=True)
align_f = jax.jit(lambda: align_bins(bins, 128))
abins = timeit("align", align_f)
colors4 = jnp.concatenate([rgbs, p.depths[:,None]], -1)
feat_f = jax.jit(lambda: cp._build_feat(p.xys, p.conics, colors4, opac, abins))
feat = timeit("build_feat", feat_f)
row0 = abins.tile_start // cp.K
nch = abins.tile_count // cp.K
ntx = (w+15)//16; nty=(h+15)//16
fwd_f = jax.jit(lambda: cp._fwd_call(feat, row0, nch, ntx, ntx*nty, 4))
accum, tfin, ncon = timeit("pallas_fwd_kernel", fwd_f)
print("max chunks per tile:", int(nch.max()), "mean:", float(nch.mean()), flush=True)

bg = jnp.zeros((4,))


# full pallas core fwd+bwd
def loss(args):
    xys, conics, cols, op = args
    img, alpha = cp.rasterize_tiles_pallas(xys, conics, cols, op, bins, w, h, 16, bg)
    return jnp.mean(img) + jnp.mean(alpha)
args = (p.xys, p.conics, colors4, opac)
timeit("pallas_full_fwd", jax.jit(lambda: cp.rasterize_tiles_pallas(*args, bins, w, h, 16, bg)))
gradf = jax.jit(jax.grad(loss))
timeit("pallas_fwd+bwd", lambda: gradf(args))
