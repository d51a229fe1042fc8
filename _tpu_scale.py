import jax, jax.numpy as jnp, time, sys
from bench import make_scene
from street_gaussians_ns_tpu.core.cameras import Camera
from street_gaussians_ns_tpu.ops.render import RenderConfig, render

def run(n, w, h, mp, mpt):
    cfg = RenderConfig(max_pairs=mp, max_per_tile=mpt, chunk=64, impl="pallas")
    means, scales, quats, opac, rgbs = make_scene(n)
    cam = Camera.make(w*0.75, w*0.75, w/2, h/2, jnp.eye(3,4), w, h)
    target = jnp.zeros((h, w, 3), jnp.float32)
    def loss_fn(*args):
        out = render(*args, cam, cfg)
        return jnp.mean(jnp.abs(out.rgb - target))
    step = jax.jit(jax.grad(loss_fn, argnums=(0,1,2,3,4)))
    g = step(means, scales, quats, opac, rgbs); jax.block_until_ready(g)
    t0=time.perf_counter()
    for _ in range(5): g = step(means, scales, quats, opac, rgbs)
    jax.block_until_ready(g)
    dt=(time.perf_counter()-t0)/5
    print(f"n={n} {w}x{h} mp=2^{mp.bit_length()-1}: {dt*1e3:.1f} ms -> {w*h/1e6/dt:.1f} Mpix/s fwd+bwd", flush=True)

for args in [(100_000, 800, 608, 2**20, 1024),
             (300_000, 1600, 1056, 2**21, 2048),
             (1_000_000, 1600, 1056, 2**22, 4096)]:
    try:
        run(*args)
    except Exception as e:
        print("FAILED", args[:2], type(e).__name__, str(e)[:200], flush=True)
        break
