"""LiDAR sweeps -> colored COLMAP points3D.txt seed points.

Native equivalent of scripts/pythons/pcd2colmap_points3D.py: per frame,
transform the lidar sweep to world, drop points inside moving-object
boxes (:174-182), color each point by projecting into the frame's
images (first camera that sees it), randomly downsample to
--points-per-frame (default 10000, :164-168), and emit COLMAP
points3D.txt rows (id x y z r g b error) with error 0.

Usage:
    python -m street_gaussians_ns_tpu.preprocess.pcd2colmap_points3d \
        --data /clip --output /clip/colmap/sparse/0/points3D_lidar.txt
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ..data.annotations import quat_to_rotmat_np
from ..data.pcd_io import read_pcd


def _cv_pose(c2w_gl: np.ndarray) -> np.ndarray:
    c2w = np.asarray(c2w_gl, np.float64).copy()
    c2w = c2w[np.array([1, 0, 2, 3]), :]
    c2w[2, :] *= -1
    c2w[0:3, 1:3] *= -1
    return c2w


def points_in_box(pts, translation, lwh, rotation_wxyz, inflate=1.0):
    R = quat_to_rotmat_np(np.asarray(rotation_wxyz, np.float64))
    local = (pts - np.asarray(translation)) @ R
    half = np.asarray(lwh) * 0.5 * inflate
    return (np.abs(local) <= half).all(axis=1)


def convert(data: Path, output: Path, points_per_frame: int = 10000,
            seed: int = 0) -> int:
    from PIL import Image

    meta = json.load(open(data / "transform.json"))
    annos = json.load(open(data / "annotation.json"))["frames"] \
        if (data / "annotation.json").exists() else []
    anno_by_ts = {round(float(a["timestamp"]), 6): a["objects"]
                  for a in annos}

    cam_frames = [f for f in meta["frames"] if "fl_x" in f]
    lidar_frames = meta.get("lidar_frames", []) or [
        f for f in meta["frames"] if f.get("type") == "lidar"
        or str(f.get("file_path", "")).startswith("lidars/")]
    by_ts = {}
    for f in cam_frames:
        by_ts.setdefault(round(float(f["timestamp"]), 6), []).append(f)

    rng = np.random.RandomState(seed)
    rows = []
    pid = 1
    for lf in lidar_frames:
        pcd_path = data / lf["file_path"]
        if not pcd_path.exists():
            continue
        xyz, _ = read_pcd(pcd_path)
        pose = np.asarray(lf["transform_matrix"], np.float64)
        world = xyz @ pose[:3, :3].T + pose[:3, 3]

        ts = round(float(lf["timestamp"]), 6)
        for obj in anno_by_ts.get(ts, []):
            if obj.get("is_moving"):
                inside = points_in_box(world, obj["translation"],
                                       obj["size"], obj["rotation"])
                world = world[~inside]

        if len(world) > points_per_frame:
            world = world[rng.choice(len(world), points_per_frame,
                                     replace=False)]

        colors = np.full((len(world), 3), 128, np.uint8)
        seen = np.zeros(len(world), bool)
        for fr in by_ts.get(ts, []):
            img_path = data / fr["file_path"]
            if not img_path.exists():
                continue
            img = np.asarray(Image.open(img_path))
            h, w = img.shape[:2]
            K = np.array([[fr["fl_x"], 0, fr["cx"]],
                          [0, fr["fl_y"], fr["cy"]], [0, 0, 1.0]])
            w2c = np.linalg.inv(_cv_pose(fr["transform_matrix"]))
            cam_pts = world @ w2c[:3, :3].T + w2c[:3, 3]
            valid = cam_pts[:, 2] > 0.1
            uv = (cam_pts[:, :2] / np.maximum(cam_pts[:, 2:3], 1e-6))
            uv = uv * np.array([K[0, 0], K[1, 1]]) + np.array(
                [K[0, 2], K[1, 2]])
            u = uv[:, 0].astype(int)
            v = uv[:, 1].astype(int)
            vis = valid & (u >= 0) & (u < w) & (v >= 0) & (v < h) & (~seen)
            colors[vis] = img[v[vis], u[vis], :3]
            seen |= vis

        for p, c in zip(world, colors):
            rows.append(f"{pid} {p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]} 0")
            pid += 1

    output.parent.mkdir(parents=True, exist_ok=True)
    output.write_text("\n".join(rows) + ("\n" if rows else ""))
    return pid - 1


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--output", type=Path, required=True)
    p.add_argument("--points-per-frame", type=int, default=10000)
    args = p.parse_args(argv)
    n = convert(args.data, args.output, args.points_per_frame)
    print(f"wrote {n} points -> {args.output}")


if __name__ == "__main__":
    main()
