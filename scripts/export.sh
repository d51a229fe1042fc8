#!/usr/bin/env bash
# Export wrapper (reference scripts/shells/export.sh equivalent).
set -euo pipefail
RUN=${1:?usage: export.sh <run_dir> [out_dir]}
OUT=${2:-"$RUN/exports"}
python -m street_gaussians_ns_tpu.scripts.export --load-dir "$RUN" --output-dir "$OUT"
