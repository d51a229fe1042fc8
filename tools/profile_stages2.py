"""Trace-based per-stage TPU timings of the render step at bench scale.

Each stage is traced separately with jax.profiler and scored by total
XLA-op device time / iterations (host timers over the axon tunnel are
unreliable). Run: python tools/profile_stages2.py [stage ...]
"""
import sys, pathlib, shutil, glob, gzip, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

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
ITERS = 10
TRACE_ROOT = "/tmp/stage_trace"


def device_ms(trace_dir):
    cands = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not cands:
        return float("nan")
    with gzip.open(sorted(cands)[-1], "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    tid_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    tot = 0.0
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "XLA Ops" not in tid_names.get((e.get("pid"), e.get("tid")), ""):
            continue
        tot += e.get("dur", 0)
    return tot / 1e3 / ITERS


def bench(name, f, *a):
    g = jax.jit(f)
    r = jax.block_until_ready(g(*a))
    d = f"{TRACE_ROOT}/{name.replace(' ', '_')}"
    shutil.rmtree(d, ignore_errors=True)
    jax.profiler.start_trace(d)
    for _ in range(ITERS):
        r = g(*a)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    print(f"{name}: {device_ms(d):.2f} ms (device)", flush=True)
    return jax.block_until_ready(jax.jit(f)(*a))


def main():
    only = set(sys.argv[1:])

    def want(s):
        return not only or s in only

    means, scales, quats, opac, rgbs = make_scene(n)
    cam = Camera.make(1200.0, 1200.0, w / 2, h / 2, jnp.eye(3, 4), w, h)
    target = jnp.zeros((h, w, 3), jnp.float32)
    cfg = RenderConfig(max_pairs=MP, max_rowruns=MR, impl="pallas",
                   precision="bf16")

    vm = viewmat_from_c2w(cam.c2w)
    proj_fn = jax.jit(lambda m, s, q, o: project(
        m, s, q, vm, cam.fx, cam.fy, cam.cx, cam.cy, w, h, opacities=o))
    p = jax.block_until_ready(proj_fn(means, scales, quats, opac))
    if want("project"):
        bench("project", lambda m, s, q, o: project(
            m, s, q, vm, cam.fx, cam.fy, cam.cx, cam.cy, w, h,
            opacities=o), means, scales, quats, opac)

    colors4 = jnp.concatenate([rgbs, p.depths[:, None]], -1)
    dk = jnp.where(p.num_tiles_hit > 0, p.depths, jnp.inf)
    tb = p.tile_box.astype(jnp.int32)

    def binp(xys, con, tbx, dkv, c4, op):
        return tl.bin_and_pack(xys, con, tbx, dkv, c4, op, w, h, 16,
                               MP, MR, with_gauss_idx=False,
                               last_color_is_depth=True,
                               precision="bf16")

    if want("bin"):
        bench("bin_and_pack", binp, p.xys, p.conics, tb, dk, colors4, opac)
    bins, feats = jax.block_until_ready(
        jax.jit(binp)(p.xys, p.conics, tb, dk, colors4, opac))

    if want("pack"):
        bench("pack_feat", lambda *fs: cp._pack_feat_cols(list(fs), MP),
              *feats)
    feat = jax.block_until_ready(
        jax.jit(lambda *fs: cp._pack_feat_cols(list(fs), MP))(*feats))

    if want("fwd"):
        bench("fwd_kernel", lambda f, s, c: cp._fwd_call(
            f, s, c, ntx, T, 4), feat, bins.tile_start, bins.tile_count)
    accum, tfin, ncon = jax.block_until_ready(jax.jit(
        lambda f, s, c: cp._fwd_call(f, s, c, ntx, T, 4))(
        feat, bins.tile_start, bins.tile_count))

    gaux = jnp.ones((T, 8, cp.PIX), jnp.float32)
    nbwd = jnp.minimum((bins.tile_count + K - 1) // K,
                       (jnp.max(ncon, axis=1) + K - 1) // K).astype(
        jnp.int32)
    print("live rows (sum nbwd):", int(jnp.sum(nbwd)), "of", MP // K,
          flush=True)
    if want("bwd"):
        bench("bwd_kernel", lambda f, s, c, nb, ga: cp._bwd_call(
            f, s, c, nb, MP // K + 1, ntx, T, 4, ga, with_rank=True),
            feat, bins.tile_start, bins.tile_count, nbwd, gaux)
    gpair = jax.block_until_ready(jax.jit(
        lambda f, s, c, nb, ga: cp._bwd_call(
            f, s, c, nb, MP // K + 1, ntx, T, 4, ga, with_rank=True))(
        feat, bins.tile_start, bins.tile_count, nbwd, gaux))

    if want("reduce"):
        bench("reduce_ranked",
              lambda gp, s, nb, npair, do: cp._reduce_pair_grads_ranked(
                  gp, s, nb, npair, do, n),
              gpair, bins.tile_start, nbwd, bins.num_pairs,
              bins.depth_order)

    if want("step"):
        def loss_fn(means, scales, quats, opac, rgbs):
            out = render(means, scales, quats, opac, rgbs, cam, cfg)
            return jnp.mean(jnp.abs(out.rgb - target))

        bench("FULL_step", jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)),
              means, scales, quats, opac, rgbs)


if __name__ == "__main__":
    main()
