"""Sweep the single-chip depth-slice decomposition at bench scale
(round 5): fwd+bwd render step time for k in {1, 2, 4, 8}.

The pair sort + rank-reduce sort are superlinear (~P^1.64), so k slices
should cut them ~k^-0.64 while kernel work stays constant; this measures
the realized net (slice imbalance, per-launch overhead, k layer merges).

Usage (TPU): python tools/bench_depth_slices.py [ks...]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import make_scene  # noqa: E402
from street_gaussians_ns_tpu.core.cameras import Camera  # noqa: E402
from street_gaussians_ns_tpu.ops.render import RenderConfig, render  # noqa: E402


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    on_tpu = jax.default_backend() == "tpu"
    n = 1_000_000 if on_tpu else 20_000
    w, h = (1600, 1056) if on_tpu else (400, 400)
    base = RenderConfig(
        max_pairs=3_407_872 if on_tpu else 2 ** 17,
        max_rowruns=1_703_936 if on_tpu else None,
        impl="pallas" if on_tpu else "chunked",
        interpret=not on_tpu,
        precision="bf16" if on_tpu else "f32")
    means, scales, quats, opac, rgbs = make_scene(n)
    cam = Camera.make(1200.0, 1200.0, w / 2, h / 2, jnp.eye(3, 4), w, h)
    target = jnp.zeros((h, w, 3), jnp.float32)

    for k in ks:
        # Slice capacity must cover the LARGEST slice: far ranks emit
        # fewer pairs per gaussian than near ranks, so start from an
        # even split and let the demand counter (bins.num_pairs = k *
        # max-slice) resize if needed.
        cfg = dataclasses.replace(base, depth_slices=k)

        def loss_fn(means, scales, quats, opac, rgbs, cfg=cfg):
            out = render(means, scales, quats, opac, rgbs, cam, cfg)
            return jnp.mean(jnp.abs(out.rgb - target)), out.bins.num_pairs

        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4),
                                has_aux=True))
        g, demand = step(means, scales, quats, opac, rgbs)
        jax.block_until_ready(g)
        demand = int(demand)
        if demand > cfg.max_pairs:
            grown = 1 << (demand - 1).bit_length()
            print(f"k={k}: demand {demand} > cap {cfg.max_pairs}; "
                  f"regrowing to {grown}")
            cfg = dataclasses.replace(cfg, max_pairs=grown,
                                      max_rowruns=grown // 2)
            step = jax.jit(jax.grad(
                lambda m, s, q, o, r, cfg=cfg: (jnp.mean(jnp.abs(
                    render(m, s, q, o, r, cam, cfg).rgb - target)),
                    jnp.int32(0)), argnums=(0, 1, 2, 3, 4), has_aux=True))
            g, _ = step(means, scales, quats, opac, rgbs)
            jax.block_until_ready(g)

        iters = 20 if on_tpu else 2
        dts = []
        for _ in range(3 if on_tpu else 1):
            t0 = time.perf_counter()
            for _ in range(iters):
                g, _ = step(means, scales, quats, opac, rgbs)
            jax.block_until_ready(g)
            dts.append((time.perf_counter() - t0) / iters)
        dt = sorted(dts)[len(dts) // 2]
        chk = float(jnp.sum(g[0][:8]))
        assert jnp.isfinite(chk), chk
        print(f"k={k}: {dt * 1e3:.2f} ms/step  "
              f"({w * h / 1e6 / dt:.1f} Mpix/s)  demand={demand} "
              f"cap={cfg.max_pairs}", flush=True)


if __name__ == "__main__":
    main()
