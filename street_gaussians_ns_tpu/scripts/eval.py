"""sgn-eval equivalent: average eval metrics over the eval split.

Usage:
    python -m street_gaussians_ns_tpu.scripts.eval \
        --load-dir outputs/run --output-path outputs/run/eval_output.json

Mirrors ComputePSNR (eval.py:45-130): renders every eval image, averages
PSNR/SSIM (+LPIPS when VGG weights are supplied), adds throughput metrics
num_rays_per_sec / fps, writes mean and std to eval_output.json in the
reference's format (:56-64, :116-128).
"""
from __future__ import annotations

import argparse
import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.setup import eval_setup
from ..models.scene_graph import forward_scene
from ..ops.ssim import psnr, ssim


def evaluate(trainer, lpips_weights=None, compute_lpips=True):
    fwd = jax.jit(functools.partial(
        forward_scene, config=trainer.config,
        render_config=trainer.render_config, training=False))
    lpips_fn = None
    if lpips_weights is not None:
        from ..ops.lpips import load_lpips
        lpips_fn = load_lpips(lpips_weights)
    elif compute_lpips:
        # Always report lpips like the reference (eval.py:30-31, 56-64).
        # No pretrained VGG ships offline, so the default is the seeded
        # random-feature variant — deterministic, perceptually
        # correlated, NOT numerically comparable to pretrained LPIPS
        # (labelled via `lpips_net` in the output).
        from ..ops.lpips import random_lpips
        lpips_fn = random_lpips()

    rows = []
    for camera, batch in trainer.dm.fixed_indices_eval():
        t0 = time.time()
        outputs, _, _ = fwd(trainer.state.store, trainer.tracks, camera,
                            trainer.state.step)
        rgb = np.asarray(outputs["rgb"])
        dt = time.time() - t0
        gt = jnp.asarray(batch["image"])
        n_rays = camera.height * camera.width
        row = {
            "psnr": float(psnr(outputs["rgb"], gt)),
            "ssim": float(ssim(gt, outputs["rgb"])),
            "num_rays_per_sec": n_rays / dt,
            "fps": 1.0 / dt,
        }
        if lpips_fn is not None:
            row["lpips"] = float(lpips_fn(outputs["rgb"], gt))
        rows.append(row)
        del rgb

    keys = rows[0].keys()
    results = {}
    for k in keys:
        vals = np.array([r[k] for r in rows])
        results[k] = float(vals.mean())
        results[f"{k}_std"] = float(vals.std())
    return results


def _chamfer(trainer, lidar_path=None):
    """LiDAR-vs-background-means chamfer in model space (the reference's
    geometric eval, geometric_metric.py:72-100)."""
    from ..ops.chamfer import evaluate_lidar_geometric

    scene = trainer.scene
    path = lidar_path or (Path(trainer.data_config.data)
                          / "aggregate_lidar" / "output.ply")
    if not Path(path).exists():
        print(f"chamfer: no aggregate lidar at {path}, skipping")
        return {}
    if str(path).endswith(".pcd"):
        from ..data.pcd_io import read_pcd
        pts, _ = read_pcd(Path(path))
    else:
        from ..data.ply_io import read_ply_points
        pts, _ = read_ply_points(Path(path))
    store = trainer.state.store.background
    act = np.asarray(store.active)
    means = np.asarray(store.params.means)[act]
    return evaluate_lidar_geometric(
        means, pts, scene.transform_matrix, scene.dataparser_scale,
        applied_translation=scene.applied_translation_in_colmap)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load-dir", type=Path, required=True,
                   help="run directory containing config.json + checkpoints")
    p.add_argument("--load-checkpoint", type=Path, default=None)
    p.add_argument("--output-path", type=Path, default=None)
    p.add_argument("--lpips-weights", type=Path, default=None,
                   help=".npz of VGG16/LPIPS weights (see ops/lpips.py); "
                        "without it a seeded random-feature VGG is used")
    p.add_argument("--no-lpips", action="store_true",
                   help="skip lpips entirely")
    p.add_argument("--compute-chamfer", action="store_true",
                   help="LiDAR-vs-means chamfer distance "
                        "(geometric_metric.py:72-100)")
    p.add_argument("--aggregate-lidar", type=Path, default=None,
                   help="aggregate LiDAR ply/pcd (default "
                        "<data>/aggregate_lidar/output.ply)")
    args = p.parse_args(argv)

    trainer = eval_setup(args.load_dir, args.load_checkpoint)
    results = evaluate(trainer, args.lpips_weights,
                       compute_lpips=not args.no_lpips)
    if args.compute_chamfer:
        results.update(_chamfer(trainer, args.aggregate_lidar))
    out = {
        "experiment_name": str(args.load_dir),
        "method_name": "street-gaussians-ns-tpu",
        "checkpoint": str(args.load_checkpoint or "latest"),
        "lpips_net": ("none" if args.no_lpips else
                      "vgg16-pretrained" if args.lpips_weights
                      else "vgg16-random-features-seed0"),
        "results": results,
    }
    out_path = args.output_path or (Path(args.load_dir) / "eval_output.json")
    json.dump(out, open(out_path, "w"), indent=2)
    print(json.dumps(out["results"], indent=2))


if __name__ == "__main__":
    main()
