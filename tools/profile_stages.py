"""Per-stage TPU timings of the differentiable render step at bench scale.

Run on a real TPU chip: `python tools/profile_stages.py`.

Two pitfalls this script avoids (see also tools/trace_summary.py):
  * host-side timers over the axon tunnel can report nonsense — the
    authoritative numbers come from a profiler trace (written to
    /tmp/sgnt_trace, summarized with tools/trace_summary.py);
  * arrays must be passed as jit ARGS (closure constants stall the
    tunnel).
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time

import jax
import jax.numpy as jnp

from bench import make_scene
from street_gaussians_ns_tpu.core.cameras import Camera, viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import project
from street_gaussians_ns_tpu.ops import composite_pallas as cp
from street_gaussians_ns_tpu.ops import tiles as tl
from street_gaussians_ns_tpu.ops.render import RenderConfig, render

n, w, h = 1_000_000, 1600, 1056
MP = 3_407_872
MR = 1_703_936
K = cp.K
ntx = (w + 15) // 16
nty = (h + 15) // 16
T = ntx * nty

means, scales, quats, opac, rgbs = make_scene(n)
cam = Camera.make(1200.0, 1200.0, w / 2, h / 2, jnp.eye(3, 4), w, h)
target = jnp.zeros((h, w, 3), jnp.float32)
cfg = RenderConfig(max_pairs=MP, max_rowruns=MR, max_per_tile=4096,
                   chunk=64, impl="pallas")


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


def loss_fn(means, scales, quats, opac, rgbs):
    out = render(means, scales, quats, opac, rgbs, cam, cfg)
    return jnp.mean(jnp.abs(out.rgb - target))


step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
g = jax.block_until_ready(step(means, scales, quats, opac, rgbs))
t0 = time.perf_counter()
for _ in range(10):
    g = step(means, scales, quats, opac, rgbs)
jax.block_until_ready(g)
print("FULL fwd+bwd (host-timed):",
      (time.perf_counter() - t0) / 10 * 1e3, "ms", flush=True)

# Stage pieces (args-passing).
vm = viewmat_from_c2w(cam.c2w)
proj_fn = jax.jit(lambda m, s, q, o: project(
    m, s, q, vm, cam.fx, cam.fy, cam.cx, cam.cy, w, h, opacities=o))
p = timeit("project", lambda m, s, q, o: proj_fn(m, s, q, o),
           means, scales, quats, opac)
colors4 = jnp.concatenate([rgbs, p.depths[:, None]], -1)
dk = jnp.where(p.num_tiles_hit > 0, p.depths, jnp.inf)
tb = p.tile_box.astype(jnp.int32)

bp = timeit("bin_and_pack(prod flags)",
            lambda xys, con, tbx, dkv, c4, op: tl.bin_and_pack(
                xys, con, tbx, dkv, c4, op, w, h, 16, MP, MR,
                with_gauss_idx=False, last_color_is_depth=True),
            p.xys, p.conics, tb, dk, colors4, opac)
bins, feats = bp
feat = timeit("pack_feat", lambda *fs: cp._pack_feat_cols(list(fs), MP),
              *feats)
out = timeit("fwd_kernel", lambda f, s, c: cp._fwd_call(f, s, c, ntx, T, 4),
             feat, bins.tile_start, bins.tile_count)
accum, tfin, ncon = out
g_accum = jnp.ones((T, 4, cp.PIX), jnp.float32)
aux = jnp.ones((T, 4, cp.PIX), jnp.float32)
nbwd = jnp.minimum((bins.tile_count + K - 1) // K,
                   (jnp.max(ncon, axis=1) + K - 1) // K).astype(jnp.int32)
print("live rows (sum nbwd):", int(jnp.sum(nbwd)), "of", MP // K,
      flush=True)
gpair = timeit("bwd_kernel",
               lambda f, s, c, nb, ga, au: cp._bwd_call(
                   f, s, c, nb, MP // K + 1, ntx, T, 4, ga, au,
                   with_rank=True),
               feat, bins.tile_start, bins.tile_count, nbwd, g_accum, aux)
timeit("reduce_ranked",
       lambda gp, s, nb, npair, do: cp._reduce_pair_grads_ranked(
           gp, s, nb, npair, do, n),
       gpair, bins.tile_start, nbwd, bins.num_pairs, bins.depth_order)

# Authoritative trace.
jax.profiler.start_trace("/tmp/sgnt_trace")
for _ in range(2):
    g = step(means, scales, quats, opac, rgbs)
jax.block_until_ready(g)
jax.profiler.stop_trace()
print("trace -> /tmp/sgnt_trace (summarize: python tools/trace_summary.py)",
      flush=True)
