"""Per-object aggregated LiDAR seeds: aggregate_lidar/dynamic_objects/<gid>.ply.

Native equivalent of scripts/pythons/extract_object_pts.py: for each
moving car, per frame crop the LiDAR sweep inside its 1.1x-inflated box,
color the crop by image projection, transform to the OBJECT frame (w2o,
:237-260), accumulate across frames, write one ply per track (:264-273) —
the seed clouds the scene graph's object models are initialized from
(dynamic_annotation.py:348-365).

Usage:
    python -m street_gaussians_ns_tpu.preprocess.extract_object_pts \
        --data /clip
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ..data.annotations import quat_to_rotmat_np
from ..data.pcd_io import read_pcd
from ..data.ply_io import write_ply
from .pcd2colmap_points3d import _cv_pose, points_in_box

INFLATE = 1.1


def extract(data: Path, filter_label=("car",)) -> int:
    from PIL import Image

    meta = json.load(open(data / "transform.json"))
    annos = json.load(open(data / "annotation.json"))["frames"]
    out_dir = data / "aggregate_lidar" / "dynamic_objects"
    out_dir.mkdir(parents=True, exist_ok=True)

    cam_by_ts = {}
    for f in meta["frames"]:
        if "fl_x" in f:
            cam_by_ts.setdefault(round(float(f["timestamp"]), 6),
                                 []).append(f)
    lidar_frames = meta.get("lidar_frames", []) or [
        f for f in meta["frames"]
        if str(f.get("file_path", "")).startswith("lidars/")]
    lidar_by_ts = {round(float(f["timestamp"]), 6): f for f in lidar_frames}

    per_object = {}
    for frame in annos:
        ts = round(float(frame["timestamp"]), 6)
        lf = lidar_by_ts.get(ts)
        if lf is None:
            continue
        pcd_path = data / lf["file_path"]
        if not pcd_path.exists():
            continue
        xyz, _ = read_pcd(pcd_path)
        pose = np.asarray(lf["transform_matrix"], np.float64)
        world = xyz @ pose[:3, :3].T + pose[:3, 3]

        for obj in frame["objects"]:
            typ = obj.get("type", "")
            if typ not in filter_label and not typ.endswith("Car"):
                continue
            if not obj.get("is_moving"):
                continue
            inside = points_in_box(world, obj["translation"], obj["size"],
                                   obj["rotation"], inflate=INFLATE)
            crop = world[inside]
            if not len(crop):
                continue
            colors = np.full((len(crop), 3), 128, np.uint8)
            seen = np.zeros(len(crop), bool)
            for fr in cam_by_ts.get(ts, []):
                img_path = data / fr["file_path"]
                if not img_path.exists():
                    continue
                img = np.asarray(Image.open(img_path))
                h, w = img.shape[:2]
                w2c = np.linalg.inv(_cv_pose(fr["transform_matrix"]))
                cam_pts = crop @ w2c[:3, :3].T + w2c[:3, 3]
                valid = cam_pts[:, 2] > 0.1
                u = (cam_pts[:, 0] / np.maximum(cam_pts[:, 2], 1e-6)
                     * fr["fl_x"] + fr["cx"]).astype(int)
                v = (cam_pts[:, 1] / np.maximum(cam_pts[:, 2], 1e-6)
                     * fr["fl_y"] + fr["cy"]).astype(int)
                vis = valid & (u >= 0) & (u < w) & (v >= 0) & (v < h) & ~seen
                colors[vis] = img[v[vis], u[vis], :3]
                seen |= vis
            # world -> object frame (w2o).
            R = quat_to_rotmat_np(np.asarray(obj["rotation"], np.float64))
            local = (crop - np.asarray(obj["translation"])) @ R
            acc = per_object.setdefault(str(obj["gid"]), ([], []))
            acc[0].append(local)
            acc[1].append(colors)

    for gid, (pts_list, col_list) in per_object.items():
        pts = np.concatenate(pts_list).astype(np.float32)
        cols = np.concatenate(col_list).astype(np.uint8)
        write_ply(out_dir / f"{gid}.ply", {
            "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
            "red": cols[:, 0], "green": cols[:, 1], "blue": cols[:, 2]})
        print(f"object {gid}: {len(pts)} pts")
    return len(per_object)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", type=Path, required=True)
    args = p.parse_args(argv)
    n = extract(args.data)
    print(f"wrote {n} object point clouds")


if __name__ == "__main__":
    main()
