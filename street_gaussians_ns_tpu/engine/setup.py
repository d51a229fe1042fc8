"""Run-dir config serialization + eval_setup.

The reference serializes its full config to config.yml and reloads it via
nerfstudio's eval_setup for sgn-eval / sgn-render / sgn-export (eval.py:47,
render.py:110, exporter.py:48). Equivalent here: config.json in the run
dir, `eval_setup(run_dir)` rebuilding (scene, datamanager, state, configs)
from it + the latest checkpoint.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import jax


def _to_jsonable(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _to_jsonable(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, Path):
        return str(obj)
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(o) for o in obj]
    return obj


def _from_jsonable(cls, data):
    import typing

    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue   # field added after this config.json was written
        v = data[f.name]
        t = hints[f.name]
        origin = typing.get_origin(t)
        if origin is typing.Union:
            args = [a for a in typing.get_args(t) if a is not type(None)]
            if v is None:
                kwargs[f.name] = None
                continue
            t = args[0]
        if dataclasses.is_dataclass(t):
            kwargs[f.name] = _from_jsonable(t, v)
        elif t is Path:
            kwargs[f.name] = Path(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def save_run_config(run_dir: Path, data_config, scene_config, trainer_config,
                    dm_config) -> Path:
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    out = run_dir / "config.json"
    json.dump({
        "data": _to_jsonable(data_config),
        "model": _to_jsonable(scene_config),
        "trainer": _to_jsonable(trainer_config),
        "dm": _to_jsonable(dm_config),
    }, open(out, "w"), indent=2)
    return out


def load_run_config(run_dir: Path):
    from ..data.datamanager import DataManagerConfig
    from ..data.dataparser import DataParserConfig
    from ..models.scene_graph import SceneGraphConfig
    from .trainer import TrainerConfig

    cfg = json.load(open(Path(run_dir) / "config.json"))
    return (_from_jsonable(DataParserConfig, cfg["data"]),
            _from_jsonable(SceneGraphConfig, cfg["model"]),
            _from_jsonable(TrainerConfig, cfg["trainer"]),
            _from_jsonable(DataManagerConfig, cfg["dm"]))


def eval_setup(run_dir: Path, checkpoint: Optional[Path] = None,
               split_all: bool = False):
    """Rebuild the full pipeline from a run dir. Returns a Trainer whose
    state is restored from the latest (or given) checkpoint."""
    from .checkpoints import latest_checkpoint, restore_checkpoint
    from .trainer import Trainer

    data_config, scene_config, trainer_config, dm_config = load_run_config(
        run_dir)
    # resume handled explicitly below; viewer_port off (the standalone
    # viewer CLI attaches its own server).
    trainer_config = dataclasses.replace(trainer_config, resume=False,
                                         output_dir=Path(run_dir),
                                         viewer_port=None)
    trainer = Trainer(data_config, scene_config, trainer_config, dm_config)
    ckpt = checkpoint or latest_checkpoint(Path(run_dir) / "checkpoints")
    if ckpt is not None:
        trainer.state = restore_checkpoint(ckpt, trainer.state)
        trainer.writer.log(f"eval_setup: restored {ckpt}")
    return trainer
