#!/usr/bin/env bash
# Render wrapper (reference scripts/shells/render.sh equivalent).
set -euo pipefail
RUN=${1:?usage: render.sh <run_dir> [out_dir]}
OUT=${2:-"$RUN/renders"}
python -m street_gaussians_ns_tpu.scripts.render --load-dir "$RUN" \
    --output-path "$OUT" --output-format video \
    --rendered-output-names rgb depth accumulation background_rgb object_rgb sky
