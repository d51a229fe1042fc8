# Verbose staged TPU check
import jax, jax.numpy as jnp, numpy as np, time, sys
print("backend:", jax.default_backend(), flush=True)
from street_gaussians_ns_tpu.core import quaternions as quat
from street_gaussians_ns_tpu.core.cameras import Camera, viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import project
from street_gaussians_ns_tpu.ops.tiles import bin_gaussians
from street_gaussians_ns_tpu.ops.composite_pallas import rasterize_tiles_pallas

n, w, h = 5000, 256, 256
key = jax.random.PRNGKey(0); ks = jax.random.split(key, 6)
means = jnp.concatenate([jax.random.normal(ks[0],(n,2))*2.0,
                         -jax.random.uniform(ks[1],(n,1))*20-2], -1)
scales = jnp.exp(jax.random.normal(ks[2],(n,3))*0.5-2.5)
quats = quat.random_quats(ks[3], n)
colors = jax.random.uniform(ks[4],(n,4))
opac = jax.random.uniform(ks[5],(n,))*0.9+0.05
cam = Camera.make(200.,200.,w/2,h/2,jnp.eye(3,4),w,h)
vm = viewmat_from_c2w(cam.c2w)
t0=time.time()
p = jax.block_until_ready(project(means, scales, quats, vm, cam.fx, cam.fy, cam.cx, cam.cy, w, h))
print(f"project ok {time.time()-t0:.1f}s", flush=True)
t0=time.time()
bins = jax.block_until_ready(bin_gaussians(p, w, h, 16, 2**17))
print(f"bin ok {time.time()-t0:.1f}s pairs={int(bins.num_pairs)}", flush=True)
bg = jnp.zeros((4,))
t0=time.time()
img, a = jax.block_until_ready(jax.jit(lambda: rasterize_tiles_pallas(p.xys,p.conics,colors,opac,bins,w,h,16,bg))())
print(f"pallas fwd ok {time.time()-t0:.1f}s img_mean={float(img.mean()):.4f}", flush=True)
from street_gaussians_ns_tpu.ops.composite_chunked import rasterize_tiles_chunked
t0=time.time()
img_c, a_c = jax.block_until_ready(jax.jit(lambda: rasterize_tiles_chunked(p.xys,p.conics,colors,opac,bins,w,h,16,bg,1024,32))())
print(f"chunked fwd ok {time.time()-t0:.1f}s diff={float(jnp.abs(img-img_c).max()):.2e}", flush=True)
target = jax.random.uniform(jax.random.PRNGKey(9),(h,w,4))
def loss(args):
    xys, conics, cols, op = args
    img, alpha = rasterize_tiles_pallas(xys,conics,cols,op,bins,w,h,16,bg)
    return jnp.mean(jnp.abs(img-target)) + 0.3*jnp.mean(alpha**2)
def loss_c(args):
    xys, conics, cols, op = args
    img, alpha = rasterize_tiles_chunked(xys,conics,cols,op,bins,w,h,16,bg,1024,32)
    return jnp.mean(jnp.abs(img-target)) + 0.3*jnp.mean(alpha**2)
args = (p.xys, p.conics, colors, opac)
t0=time.time()
gp = jax.block_until_ready(jax.jit(jax.grad(loss))(args))
print(f"pallas bwd ok {time.time()-t0:.1f}s", flush=True)
t0=time.time()
gc = jax.block_until_ready(jax.jit(jax.grad(loss_c))(args))
print(f"chunked bwd ok {time.time()-t0:.1f}s", flush=True)
for name, a_, b_ in zip(["xys","conics","colors","opac"], gp, gc):
    d = float(jnp.abs(a_-b_).max()); r = float(jnp.abs(b_).max())
    print(f"bwd {name}: maxdiff {d:.3e} (ref mag {r:.3e})", flush=True)
