import jax, jax.numpy as jnp, time, sys
from bench import make_scene
from street_gaussians_ns_tpu.core.cameras import Camera
from street_gaussians_ns_tpu.ops.render import RenderConfig, render

def run(tag, n, w, h, mp, grad=True):
    cfg = RenderConfig(max_pairs=mp, max_per_tile=2048, chunk=64, impl="pallas")
    means, scales, quats, opac, rgbs = make_scene(n)
    cam = Camera.make(w*0.75, w*0.75, w/2, h/2, jnp.eye(3,4), w, h)
    target = jnp.zeros((h, w, 3), jnp.float32)
    def loss_fn(*args):
        out = render(*args, cam, cfg)
        return jnp.mean(jnp.abs(out.rgb - target))
    try:
        if grad:
            f = jax.jit(jax.grad(loss_fn, argnums=(0,1,2,3,4)))
        else:
            f = jax.jit(loss_fn)
        r = f(means, scales, quats, opac, rgbs); jax.block_until_ready(r)
        print(f"OK {tag}", flush=True)
    except Exception as e:
        print(f"FAIL {tag}: {type(e).__name__} {str(e)[:120]}", flush=True)

run("300k@800x608 grad", 300_000, 800, 608, 2**21)
run("100k@1600x1056 fwd", 100_000, 1600, 1056, 2**20, grad=False)
run("100k@1600x1056 grad", 100_000, 1600, 1056, 2**20)
