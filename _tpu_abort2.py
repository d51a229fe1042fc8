import jax, jax.numpy as jnp, sys
from bench import make_scene
from street_gaussians_ns_tpu.core.cameras import Camera
from street_gaussians_ns_tpu.ops.render import RenderConfig, render
tag, n, mp, grad = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]=="1"
w, h = 800, 608
cfg = RenderConfig(max_pairs=mp, max_per_tile=2048, chunk=64, impl="pallas")
means, scales, quats, opac, rgbs = make_scene(n)
cam = Camera.make(w*0.75, w*0.75, w/2, h/2, jnp.eye(3,4), w, h)
target = jnp.zeros((h, w, 3), jnp.float32)
def loss_fn(*args):
    out = render(*args, cam, cfg)
    return jnp.mean(jnp.abs(out.rgb - target))
f = jax.jit(jax.grad(loss_fn, argnums=(0,1,2,3,4))) if grad else jax.jit(loss_fn)
r = f(means, scales, quats, opac, rgbs); jax.block_until_ready(r)
print(f"OK {tag}", flush=True)
