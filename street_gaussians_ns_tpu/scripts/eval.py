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


def evaluate(trainer, lpips_weights=None):
    fwd = jax.jit(functools.partial(
        forward_scene, config=trainer.config,
        render_config=trainer.render_config, training=False))
    lpips_fn = None
    if lpips_weights is not None:
        from ..ops.lpips import load_lpips
        lpips_fn = load_lpips(lpips_weights)

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


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load-dir", type=Path, required=True,
                   help="run directory containing config.json + checkpoints")
    p.add_argument("--load-checkpoint", type=Path, default=None)
    p.add_argument("--output-path", type=Path, default=None)
    p.add_argument("--lpips-weights", type=Path, default=None,
                   help=".npz of VGG16/LPIPS weights (see ops/lpips.py)")
    args = p.parse_args(argv)

    trainer = eval_setup(args.load_dir, args.load_checkpoint)
    results = evaluate(trainer, args.lpips_weights)
    out = {
        "experiment_name": str(args.load_dir),
        "method_name": "street-gaussians-ns-tpu",
        "checkpoint": str(args.load_checkpoint or "latest"),
        "results": results,
    }
    out_path = args.output_path or (Path(args.load_dir) / "eval_output.json")
    json.dump(out, open(out_path, "w"), indent=2)
    print(json.dumps(out["results"], indent=2))


if __name__ == "__main__":
    main()
