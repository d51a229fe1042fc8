#!/usr/bin/env bash
# Offline data pipeline for one extracted Waymo clip — the equivalent of the
# reference's scripts/shells/data_process.sh orchestration (SURVEY.md §3.6):
#   segs -> masks -> known-pose colmap seed -> COLMAP SfM -> lidar points ->
#   combined seed points -> per-object point clouds.
set -euo pipefail
DATA=${1:?usage: data_process.sh <clip_dir>}
PY="python -m street_gaussians_ns_tpu.preprocess"

$PY.segs_generate --data "$DATA" --mode naive
$PY.masks_generate --data "$DATA" --dilate 25
$PY.transform2colmap --data "$DATA" --output-dir "$DATA/colmap/origin"
$PY.run_colmap --data "$DATA"
$PY.pcd2colmap_points3d --data "$DATA" \
    --output "$DATA/colmap/sparse/0/points3D_lidar.txt"
$PY.colmap_pts_combine --colmap-dir "$DATA/colmap/sparse/0" \
    --lidar-points points3D_lidar.txt
$PY.extract_object_pts --data "$DATA"
echo "data_process: done -> $DATA"
