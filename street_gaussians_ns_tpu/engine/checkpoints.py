"""Shape-stable checkpointing of train states.

The reference checkpoints torch state_dicts whose Gaussian tensors change
size between saves, forcing load-time reallocation (sgn_splatfacto.py:
425-437) and scene-graph key routing (scene_graph:393-400). Our fixed-
capacity stores make checkpoints shape-stable: the whole TrainState pytree
(params, active masks, Adam moments, step, rng) serializes to one .npz
keyed by tree paths, and restore is a pure structural match — resume never
recompiles.

Layout: <ckpt_dir>/step-{:09d}.ckpt.npz (save cadence mirrors nerfstudio's
step-{:09d}.ckpt naming so run dirs look familiar).
"""
from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_checkpoint(ckpt_dir: Path, step: int, state: Any) -> Path:
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {_path_str(path): np.asarray(leaf) for path, leaf in flat}
    out = ckpt_dir / f"step-{step:09d}.ckpt.npz"
    np.savez(out, **arrays)
    return out


def restore_checkpoint(path: Path, target: Any) -> Any:
    """Restore into the structure of `target` (matching by tree path)."""
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(target)
    leaves = []
    for p, leaf in flat:
        key = _path_str(p)
        if key not in data:
            raise KeyError(f"checkpoint {path} missing leaf {key}")
        arr = data[key]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs "
                f"target {leaf.shape}")
        leaves.append(jax.numpy.asarray(arr).astype(leaf.dtype)
                      if hasattr(leaf, "dtype") else arr)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(target), leaves)


def latest_checkpoint(ckpt_dir: Path) -> Optional[Path]:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    best, best_step = None, -1
    for p in ckpt_dir.glob("step-*.ckpt.npz"):
        m = re.match(r"step-(\d+)\.ckpt\.npz", p.name)
        if m and int(m.group(1)) > best_step:
            best, best_step = p, int(m.group(1))
    return best
