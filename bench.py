"""Headline benchmark: rasterized Mpix/s per chip, forward + backward.

Scene: Waymo-scale synthetic — 1600x1056 image (the reference downscales
Waymo frames to max dim ~1600, sgn_dataparser.py:39), 1M Gaussians in a
street-like frustum distribution. Measures the full differentiable render
step: EWA projection -> tile binning + (tile,depth) sort -> fused alpha
compositing (rgb+depth) -> L1 loss -> backward to all Gaussian params
(incl. the screen-space xy grads densification needs).

Baseline (BASELINE.md): the reference trains 30k steps in ~0.5 h on an
RTX 4090 => ~16.7 steps/s at ~1.71 Mpix/frame => ~28.5 Mpix/s fwd+bwd
(an upper bound for the CUDA path since that time also includes optimizer
and refinement). vs_baseline = ours / 28.5.

Prints ONE JSON line.
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp

from street_gaussians_ns_tpu.core import quaternions as quat
from street_gaussians_ns_tpu.core.cameras import Camera
from street_gaussians_ns_tpu.ops.render import RenderConfig, render

BASELINE_MPIX_S = 28.5


def make_scene(n, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    # Street-like: points spread along a corridor in front of the camera.
    xy = jax.random.normal(ks[0], (n, 2)) * jnp.array([8.0, 2.0])
    z = -(jax.random.uniform(ks[1], (n,)) ** 1.5) * 60.0 - 2.0
    means = jnp.concatenate([xy, z[:, None]], axis=-1)
    scales = jnp.exp(jax.random.normal(ks[2], (n, 3)) * 0.5 - 3.3)
    quats = quat.random_quats(ks[3], n)
    rgbs = jax.random.uniform(ks[4], (n, 3))
    opac = jax.random.uniform(ks[5], (n,)) * 0.8 + 0.1
    return means, scales, quats, opac, rgbs


def main():
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    n = 1_000_000 if on_tpu else 20_000
    w, h = (1600, 1056) if on_tpu else (400, 400)
    impl = "pallas" if on_tpu else "chunked"
    # Pair capacity sized to the scene (opacity-aware ellipse binning
    # emits ~3.36M true pairs / ~1.56M row runs): every binning /
    # reduction pass is O(max_pairs), so capacity slack is pure overhead.
    cfg = RenderConfig(
        max_pairs=3_407_872 if on_tpu else 2 ** 17,   # 26624 x 128
        max_rowruns=1_703_936 if on_tpu else None,    # 13312 x 128
        max_per_tile=4096 if on_tpu else 512,
        chunk=64 if on_tpu else 32,
        impl=impl,
        # Production precision: conics/opacity/colors ride the binning
        # sorts as bf16 pairs (~2^-8 relative rounding, sub-1e-2 on RGB;
        # xy and ordering exact) — see RenderConfig.precision.
        precision="bf16" if on_tpu else "f32",
    )
    means, scales, quats, opac, rgbs = make_scene(n)
    cam = Camera.make(1200.0, 1200.0, w / 2, h / 2, jnp.eye(3, 4), w, h)
    target = jnp.zeros((h, w, 3), jnp.float32)

    def loss_fn(means, scales, quats, opac, rgbs):
        out = render(means, scales, quats, opac, rgbs, cam, cfg)
        return jnp.mean(jnp.abs(out.rgb - target))

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))

    # Warmup/compile.
    g = step(means, scales, quats, opac, rgbs)
    jax.block_until_ready(g)

    # Synchronized reference timing: block every step. The axon tunnel
    # occasionally mis-reports pipelined timings by orders of magnitude
    # (block_until_ready returning early) — per-step blocking is immune.
    sync_iters = 5 if on_tpu else 2
    t0 = time.perf_counter()
    chk = 0.0
    for _ in range(sync_iters):
        g = step(means, scales, quats, opac, rgbs)
        # A device->host scalar fetch CANNOT return before the step ran
        # (data dependency), unlike a lied-about block_until_ready.
        chk = float(jnp.sum(g[0][:8]))
    dt_sync = (time.perf_counter() - t0) / sync_iters
    assert jnp.isfinite(chk), f"non-finite grads in bench step: {chk}"

    # MEDIAN of 3 pipelined passes: the tunnel-attached chip drifts
    # +/- ~3.5 ms between identical runs (round-4 measurement). The
    # median damps the drift while staying robust to a single
    # wait-dropped reading in the guard's blind band (a too-fast pass
    # between 10 ms and 0.15*dt_sync would WIN a min() but not a
    # median).
    iters = 20 if on_tpu else 3
    passes = 3 if on_tpu else 1
    dts = []
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(iters):
            g = step(means, scales, quats, opac, rgbs)
        jax.block_until_ready(g)
        dts.append((time.perf_counter() - t0) / iters)
    dt = sorted(dts)[len(dts) // 2]
    timing_mode = "pipelined"
    # Both conditions: relative (impossible vs the synced reference) AND
    # absolute (a real 1M-gaussian step cannot run in <10 ms; observed
    # pathological readings are ~0.05 ms). The absolute floor keeps a
    # noisy sync reference (tunnel dispatch adds 100-300 ms/step) from
    # ever displacing a valid pipelined measurement.
    if dt < 0.15 * dt_sync and (not on_tpu or dt * 1e3 < 10.0):
        # Pipelined reading is physically impossible relative to the
        # synchronized one: the tunnel dropped the wait. Report the
        # (slightly pessimistic: includes per-step dispatch latency)
        # synchronized number instead of garbage.
        dt = dt_sync
        timing_mode = "sync-fallback"

    mpix_s = (w * h / 1e6) / dt
    detail = {"backend": backend, "impl": impl, "gaussians": n,
              "resolution": [w, h], "ms_per_step": round(dt * 1e3, 2),
              "ms_per_step_sync": round(dt_sync * 1e3, 2),
              "timing_mode": timing_mode,
              "precision": cfg.precision}
    # Attach the training-side numbers when bench_train.py has run (the
    # full scene_train_step + refine + the synthetic PSNR curve — the
    # second north-star metric; see bench_train.json for the curves).
    try:
        import pathlib

        bt = {r["metric"]: r for r in json.load(open(
            pathlib.Path(__file__).parent / "bench_train.json"))}
        # Rows looked up BY METRIC NAME: bench_train.py merge-upserts
        # into an existing json, so positional indexing could read a
        # stale row from an older protocol under a new label.
        if "train_step_per_s" in bt:
            r = bt["train_step_per_s"]
            detail["train_step_ms"] = r["detail"]["ms_amortized"]
            detail["train_steps_per_s"] = r["value"]
        if "synthetic_psnr_curve" in bt:
            r = bt["synthetic_psnr_curve"]
            detail["synthetic_psnr_2k_steps"] = r["value"]
            detail["synthetic_secs_to_psnr33"] = next(
                (c["wall_s"] for c in r["detail"]["curve"]
                 if c["psnr"] >= 33.0), None)
        if "heldout_psnr_curve" in bt:
            r = bt["heldout_psnr_curve"]
            detail["heldout_psnr_final"] = r["value"]
            detail["heldout_secs_to_psnr33"] = r["detail"].get(
                "secs_to_heldout_psnr33")
            detail["heldout_protocol"] = r["detail"].get("protocol")
    except Exception:
        pass
    # Speed-of-light budget (round 5, tools/sol_budget.py — derivation +
    # on-chip chunk-count probe; README "Speed of light" table).
    detail["sol"] = {
        "step_floor_ms_current_algorithms": 47.0,
        "kernel_mfu": "fwd 12.2 ms / bwd 21.8 ms run at ~1.5 vector "
                      "ops/cycle (15242 chunks x ~70/~130 (256,64) ops) "
                      "— AT the VPU issue roofline (multi-ALU dual "
                      "issue); classic FLOP-MFU is meaningless for a "
                      "select/compare compositing recurrence. Kernel "
                      "work is done; headroom lives in movement: "
                      "pair_sort 2.8x, grad_reduce 4.4x, expansions "
                      "~31x, row_trim ~12x, cumsums ~39x above their "
                      "resource bounds (table: tools/sol_budget.py).",
    }
    detail["roofline"] = (
        "step anatomy (trace, ms, round 4): pair-sort 16.2 (was 20: all "
        "binning sorts now 2-key UNSTABLE with a unique tiebreak key - "
        "XLA's stable lowering costs a hidden iota operand, ~5.5 ms at "
        "3.4M) + grad-reduce ~17 (denser compaction-cap ladder; was "
        "silently full-size at 28) + bwd-kernel 22 + fwd-kernel 13 + "
        "expansions 11 + row-trim 5 + depth-sort 4.4 + project 1. "
        "lax.sort is SUPERLINEAR in rows (~P^1.64: P/2 -> 0.43x, P/4 -> "
        "0.18x, tools/bench_sort_ops.py) - which is also why per-slice "
        "model-sharded binning beats 1/M. Rejected movers (measured): "
        "XLA unique-scatter 15.8 ms/column, row-gather 77 ms, Pallas "
        "radix scatter >=25k fragment DMAs/pass, sort-free mixed-tile "
        "compositor 1.4-1.6x kernel work, int64-packed payloads no "
        "cheaper than 2x int32, batched row-sorts cheap but re-merging "
        "their streams re-pays the cost - tools/bench_scatter.py, "
        "tools/bench_sort_ops.py, tools/probe_mixed.py, "
        "tools/bench_tile_overhead.py.")
    detail["scaling"] = {
        "model_axis_comm_MB_per_step": {
            "attrs_all_gather": 64,
            "layer_all_gather_per_peer_bf16": 16.9,
            "formula": "2*64*(M-1)/M + 2*16.9*(M-1) over ICI "
                       "~50 GB/s/direction (bf16 layer gather, round 5)"},
        "data_axis_comm_MB_per_step": {
            "grad_psum": "2*236/M (59 f32/gaussian, model-sharded)"},
        "projected_step_ms_model_axis": {"M=2": 76, "M=4": 46, "M=8": 33},
        "projected_2host_dp_efficiency": "~93% (236 MB over DCN 25 GB/s "
                                         "= 9.4 ms vs 125 ms step)",
        "notes": "round 5: PAIR-BALANCED device windows (equal-count "
                 "slices measured 1.68x pair imbalance; balanced via "
                 "trim-count all_gather + cumsum quantiles, virtual-mesh "
                 "exact) + bf16 layer all_gather lift the M=8 "
                 "projection 3.1x -> 3.7x; the remaining replicated "
                 "~10 ms (full-N depth sort + grad unsort + "
                 "rank_rowsum) falls to the designed splitter-bucketed "
                 "distributed sort (-> ~4.9x) + ordered layer scan "
                 "(-> ~5.7x) — arithmetic in README 'Scaling model'. "
                 "2-process DCN smoke now ALSO runs at bench-like "
                 "shapes (256x256, 114k gaussians, bf16, capacity "
                 "growth across the process boundary) in BOTH mesh "
                 "directions (tests/test_multihost.py --scale)."}
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_mpix_per_s",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
