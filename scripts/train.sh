#!/usr/bin/env bash
# Full training invocation — equivalent of the reference's
# scripts/shells/train.sh (front camera only, lidar-combined seed points).
set -euo pipefail
DATA=${1:?usage: train.sh <clip_dir> [output_dir]}
OUT=${2:-outputs/$(basename "$DATA")}

python -m street_gaussians_ns_tpu.scripts.train \
    --data "$DATA" \
    --filter-camera-id 1 \
    --init-points-filename points3D_withlidar.txt \
    --trainer.output-dir "$OUT" \
    --trainer.max-num-iterations 30000
