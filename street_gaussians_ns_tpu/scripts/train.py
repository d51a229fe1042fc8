"""sgn-train equivalent: train a street-gaussians scene graph on a clip.

Usage:
    python -m street_gaussians_ns_tpu.scripts.train \
        --data /path/to/clip --output-dir outputs/run \
        --filter-camera-id 1 --max-num-iterations 30000

Mirrors the reference's `sgn-train street-gaussians-ns ...` entry point
(pyproject.toml:25 + train.sh) with the tyro-style dotted overrides
provided by utils.cli.
"""
from __future__ import annotations

import argparse

from ..data.datamanager import DataManagerConfig
from ..data.dataparser import DataParserConfig
from ..engine.trainer import Trainer, TrainerConfig
from ..models.scene_graph import SceneGraphConfig
from ..utils.cli import add_dataclass_args, dataclass_from_args


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_dataclass_args(p, DataParserConfig)
    add_dataclass_args(p, TrainerConfig, prefix="trainer.")
    add_dataclass_args(p, DataManagerConfig, prefix="dm.")
    add_dataclass_args(p, SceneGraphConfig, prefix="model.")
    # Multi-chip mesh (parallel.ShardedTrainer): any of these selects the
    # shard_mapped (data, model) training step. New TPU capability — the
    # reference is single-GPU (SURVEY.md §2.4).
    p.add_argument("--mesh-data", type=int, default=None,
                   help="data-parallel mesh rows (cameras per step)")
    p.add_argument("--mesh-model", type=int, default=None,
                   help="model-parallel mesh cols (Gaussian/tile shards)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="jax.distributed coordinator address (multi-host)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    data_config = dataclass_from_args(DataParserConfig, args)
    trainer_config = dataclass_from_args(TrainerConfig, args, "trainer.")
    dm_config = dataclass_from_args(DataManagerConfig, args, "dm.")
    scene_config = dataclass_from_args(SceneGraphConfig, args, "model.")
    if (args.mesh_data is not None or args.mesh_model is not None
            or args.coordinator is not None):
        from ..parallel.trainer import ShardedTrainer

        trainer = ShardedTrainer(
            data_config, scene_config, trainer_config, dm_config,
            mesh_data=args.mesh_data, mesh_model=args.mesh_model,
            coordinator=args.coordinator,
            num_processes=args.num_processes, process_id=args.process_id)
    else:
        trainer = Trainer(data_config, scene_config, trainer_config,
                          dm_config)
    trainer.train()


if __name__ == "__main__":
    main()
