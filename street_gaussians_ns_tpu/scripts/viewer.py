"""Standalone checkpoint viewer (the `ns-viewer` analog).

Usage:
    python -m street_gaussians_ns_tpu.scripts.viewer \
        --load-dir outputs/run [--port 7007]

Loads the run's config + latest checkpoint (engine.setup.eval_setup, the
reference's eval_setup reload path, eval.py:47) and serves the live fly
camera viewer (utils.viewer) with this process dedicated to servicing
render requests. Training-time viewing is built into the Trainer instead
(TrainerConfig.viewer_port).
"""
from __future__ import annotations

import argparse
from pathlib import Path


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load-dir", type=Path, required=True)
    p.add_argument("--port", type=int, default=7007)
    args = p.parse_args()

    from ..engine.setup import eval_setup
    from ..engine.trainer import attach_viewer

    trainer = eval_setup(args.load_dir)
    server = attach_viewer(trainer, args.port)
    server.update_stats(step=int(trainer.state.step), mode="checkpoint")
    print(f"viewer: http://localhost:{server.port}/  (ctrl-c to stop)",
          flush=True)
    server.serve_forever(trainer._viewer_render)


if __name__ == "__main__":
    main()
