"""Waymo-readiness drill (VERDICT r3 #9): one command that runs the FULL
user journey on a processed clip directory and prints a checklist.

    python tools/waymo_smoke.py --data /path/to/clip [--steps 200]
                                [--out /tmp/smoke_out] [--mesh-model M]

Stages (each timed, each must pass before the next runs):
  1. parse      — COLMAP + annotations through data.dataparser
  2. train      — Trainer (or ShardedTrainer with --mesh-*) for N steps
  3. eval       — sgnt-eval: PSNR/SSIM/LPIPS + eval_output.json
  4. render     — sgnt-render: rgb/depth image sequence for the test split
  5. export     — sgnt-export: per-submodel Inria .ply
  6. resume     — reload the checkpoint through eval_setup and render one
                  frame (checkpoint round-trip)

A real Waymo clip has never flowed through this environment (zero
egress); this drill is the recorded one-command recipe for the day one
can — and its synthetic-clip dry run is CI-tested
(tests/test_waymo_smoke.py). Expected clip layout = the reference's
processed output (SURVEY.md L0): colmap/{cameras,images,points3D}.bin (or
.txt), images*/, optionally masks/, segs/, dynamic_annotations.json,
pointcloud/.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time
import traceback

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


class Check:
    def __init__(self):
        self.rows = []

    def run(self, name, fn):
        t0 = time.time()
        try:
            info = fn() or ""
            self.rows.append((name, True, time.time() - t0, str(info)))
            print(f"[ OK ] {name:<10} {time.time() - t0:7.1f}s  {info}",
                  flush=True)
            return True
        except Exception as e:  # noqa: BLE001 — checklist must report all
            self.rows.append((name, False, time.time() - t0, repr(e)))
            traceback.print_exc()
            print(f"[FAIL] {name:<10} {time.time() - t0:7.1f}s  {e!r}",
                  flush=True)
            return False


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", type=pathlib.Path, required=True)
    p.add_argument("--out", type=pathlib.Path,
                   default=pathlib.Path("/tmp/waymo_smoke_out"))
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--mesh-data", type=int, default=None)
    p.add_argument("--mesh-model", type=int, default=None)
    p.add_argument("--bg-capacity", type=int, default=2 ** 15)
    p.add_argument("--max-pairs", type=int, default=2 ** 18)
    args = p.parse_args(argv)

    import jax

    from street_gaussians_ns_tpu.data.dataparser import (DataParserConfig,
                                                         parse_scene)
    from street_gaussians_ns_tpu.data.datamanager import DataManagerConfig
    from street_gaussians_ns_tpu.engine.trainer import (Trainer,
                                                        TrainerConfig)
    from street_gaussians_ns_tpu.models.scene_graph import SceneGraphConfig
    from street_gaussians_ns_tpu.scripts import eval as eval_cli
    from street_gaussians_ns_tpu.scripts import export as export_cli
    from street_gaussians_ns_tpu.scripts import render as render_cli

    ck = Check()
    out = args.out
    out.mkdir(parents=True, exist_ok=True)
    run_dir = out / "run"

    # 50/50 split so eval/render/resume have held-out frames even on
    # tiny clips (the reference's default split leaves all frames train).
    data_cfg = DataParserConfig(data=args.data,
                                load_dynamic_annotations=True,
                                train_split_fraction=0.5)

    def do_parse():
        scene = parse_scene(data_cfg)
        n_obj = (0 if scene.annotations is None
                 else scene.annotations.num_objects)
        return (f"{len(scene.image_paths)} frames, "
                f"{len(scene.train_indices)} train, {n_obj} objects, "
                f"{0 if scene.points_xyz is None else len(scene.points_xyz)}"
                " seed points")

    if not ck.run("parse", do_parse):
        sys.exit(1)

    def do_train():
        scene_cfg = SceneGraphConfig()
        tc = TrainerConfig(
            max_num_iterations=args.steps,
            steps_per_save=args.steps, steps_per_eval_image=10 ** 9,
            steps_per_eval_all_images=10 ** 9,
            background_capacity=args.bg_capacity,
            max_pairs=args.max_pairs, output_dir=run_dir,
            render_impl=("pallas" if jax.default_backend() == "tpu"
                         else "chunked"),
            resume=False)
        dm_cfg = DataManagerConfig()
        if args.mesh_data or args.mesh_model:
            from street_gaussians_ns_tpu.parallel.trainer import (
                ShardedTrainer)
            tr = ShardedTrainer(data_cfg, scene_cfg, tc, dm_cfg,
                                mesh_data=args.mesh_data,
                                mesh_model=args.mesh_model)
        else:
            tr = Trainer(data_cfg, scene_cfg, tc, dm_cfg)
        state = tr.train()
        return (f"{args.steps} steps, "
                f"{int(state.store.background.num_active)} bg gaussians "
                "active")

    if not ck.run("train", do_train):
        sys.exit(1)

    ck.run("eval", lambda: eval_cli.main([
        "--load-dir", str(run_dir),
        "--output-path", str(out / "eval_output.json"), "--no-lpips"])
        or json.load(open(out / "eval_output.json"))["results"])
    ck.run("render", lambda: render_cli.main([
        "--load-dir", str(run_dir), "--output-path", str(out / "renders"),
        "--split", "test", "--output-format", "images"]))
    ck.run("export", lambda: export_cli.main([
        "--load-dir", str(run_dir), "--output-dir", str(out / "export")]))

    def do_resume():
        import numpy as np

        from street_gaussians_ns_tpu.engine.setup import eval_setup
        tr = eval_setup(run_dir)
        step = int(tr.state.step)
        assert step == args.steps, (step, args.steps)
        cam, _ = (tr.dm.next_eval(0) if tr.dm.num_eval
                  else tr.dm.next_train(0))
        img = tr._viewer_render(np.asarray(cam.c2w), float(cam.time),
                                cam.width, cam.height)
        assert img.shape[0] == cam.height
        return f"checkpoint step {step} reloaded, frame re-rendered"

    ck.run("resume", do_resume)

    n_fail = sum(1 for _, ok, _, _ in ck.rows if not ok)
    print("\n==== WAYMO SMOKE " + ("FAILED" if n_fail else "PASSED")
          + f" ({len(ck.rows) - n_fail}/{len(ck.rows)}) ====")
    json.dump([{"stage": n, "ok": ok, "secs": round(t, 1), "info": i}
               for n, ok, t, i in ck.rows],
              open(out / "smoke_checklist.json", "w"), indent=1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
