"""sgn-export equivalent: write Inria-compatible 3DGS .ply per submodel.

Usage:
    python -m street_gaussians_ns_tpu.scripts.export \
        --load-dir outputs/run --output-dir exports/

Mirrors ExportGaussianSplat (exporter.py:44-135): one
point_cloud_<name>.ply per submodel (background + object_<gid>), Inria
field layout with NaN/Inf filtering (data.ply_io.write_gaussian_ply).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ..data.ply_io import write_gaussian_ply
from ..engine.setup import eval_setup
from ..models.fourier import fourier_dc


def export_store(path: Path, params, active, name: str) -> int:
    act = np.asarray(active)
    # Collapse Fourier DC at t=0 for the static export (IDFT row 0).
    dc = np.asarray(fourier_dc(params.features_dc, 0.0))
    n = write_gaussian_ply(
        path,
        np.asarray(params.means)[act],
        dc[act],
        np.asarray(params.features_rest)[act],
        np.asarray(params.opacities)[act, 0],
        np.asarray(params.scales)[act],
        np.asarray(params.quats)[act],
    )
    print(f"wrote {n} gaussians -> {path}")
    return n


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load-dir", type=Path, required=True)
    p.add_argument("--load-checkpoint", type=Path, default=None)
    p.add_argument("--output-dir", type=Path, required=True)
    args = p.parse_args(argv)

    trainer = eval_setup(args.load_dir, args.load_checkpoint)
    args.output_dir.mkdir(parents=True, exist_ok=True)
    store = trainer.state.store

    export_store(args.output_dir / "point_cloud_background.ply",
                 store.background.params, store.background.active,
                 "background")
    db = trainer.scene.annotations
    if db is not None:
        for i, gid in enumerate(db.track_ids):
            import jax

            params_i = jax.tree.map(lambda x: x[i], store.objects.params)
            export_store(args.output_dir / f"point_cloud_object_{gid}.ply",
                         params_i, store.objects.active[i], f"object_{gid}")


if __name__ == "__main__":
    main()
