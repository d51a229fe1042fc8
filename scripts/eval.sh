#!/usr/bin/env bash
# Eval wrapper (reference scripts/shells/eval.sh equivalent).
set -euo pipefail
RUN=${1:?usage: eval.sh <run_dir>}
python -m street_gaussians_ns_tpu.scripts.eval --load-dir "$RUN"
