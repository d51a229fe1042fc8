"""Multi-chip training runtime: the host loop around the shard_mapped
scene step (parallel.sharded) — the production driveable path for the
"train on a v5e pod" target (BASELINE.md; new capability vs the
single-GPU reference, SURVEY.md §2.4).

ShardedTrainer reuses the single-device Trainer's scene/data/store
construction and checkpoint/eval machinery, and replaces the inner loop:

  * one step consumes `data` cameras (one per data-mesh row) — DP over
    frames with gradient psum via the collective transpose;
  * the background Gaussian store (and its Adam moments) live sharded
    over 'model' (place_state); the compositor runs the production
    Pallas kernels per tile strip inside shard_map;
  * refinement runs as a GSPMD-partitioned jit over the same sharded
    buffers (masked scatters + capacity cumsums partition automatically;
    the inserted collectives amortize over the refine_every cadence);
  * multi-host entry via parallel.mesh.multihost_init (jax.distributed
    over DCN), each host feeding its own data rows.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..engine.scene_train_step import scene_refine_step
from ..engine.trainer import Trainer
from .mesh import make_mesh, multihost_init
from .sharded import make_sharded_train_step, stack_batches, stack_cameras


def place_state(state, mesh):
    """Place a SceneTrainState on the mesh: every leaf whose leading axis
    is the background capacity (params, active mask, stats, Adam moments)
    shards over 'model'; everything else (objects, env, bbox, scalars)
    replicates. Shape-keyed so it covers the nested opt dicts without
    per-field plumbing."""
    msize = mesh.shape["model"]
    cap = state.store.background.capacity
    mdl = NamedSharding(mesh, P("model"))
    repl = NamedSharding(mesh, P())

    def rule(x):
        if (hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap
                and cap % msize == 0):
            return jax.device_put(x, mdl)
        return jax.device_put(x, repl)

    return jax.tree.map(rule, state)


def make_sharded_refine_step(config, num_train_data):
    """Refinement over the sharded store: plain jit — GSPMD partitions the
    fixed-capacity masked ops along the 'model'-sharded capacity axis from
    the input shardings (scatter-compaction inserts collectives; refine
    runs every refine_every steps, so they amortize)."""
    return jax.jit(functools.partial(scene_refine_step, config=config,
                                     num_train_data=num_train_data))


class ShardedTrainer(Trainer):
    """Trainer whose inner step is the shard_mapped multi-chip step.

    Only the step dispatch (`_run_step`), the refine fn, and the compile
    caches are overridden — the host loop itself (refine cadence,
    pair-capacity growth, metrics/viewer/eval/save) is Trainer.train, so
    the two paths cannot drift."""

    def __init__(self, *args, mesh_data: Optional[int] = None,
                 mesh_model: Optional[int] = None,
                 coordinator: Optional[str] = None,
                 num_processes: Optional[int] = None,
                 process_id: Optional[int] = None, **kwargs):
        multihost_init(coordinator, num_processes, process_id)
        self.mesh = make_mesh(data=mesh_data, model=mesh_model)
        super().__init__(*args, **kwargs)
        cap = self.state.store.background.capacity
        assert cap % self.mesh.shape["model"] == 0, (
            f"background capacity {cap} must divide the model axis "
            f"{self.mesh.shape['model']}")
        self.state = place_state(self.state, self.mesh)
        self._refine_fn = make_sharded_refine_step(self.config,
                                                   self.dm.num_train)
        self._sstep = {}

    def _invalidate_step_fns(self):
        super()._invalidate_step_fns()
        self._sstep.clear()

    def _sharded_step_fn(self, width: int, height: int, step: int):
        subset_accs = (self.config.object_acc_entropy_loss_mult > 0
                       and step > self.config.background.stop_split_at)
        key = (width, height, subset_accs, self.render_config.max_pairs)
        if key not in self._sstep:
            self._sstep[key] = make_sharded_train_step(
                self.mesh, self.config, self.render_config, width, height,
                cap_bg=self.state.store.background.capacity,
                subset_accs=subset_accs)
        return self._sstep[key]

    def _run_step(self, step: int):
        cams, batches = [], []
        for _ in range(self.mesh.shape["data"]):
            camera, batch = self.dm.next_train(step)
            cams.append(camera)
            batches.append(batch)
        h, w = cams[0].height, cams[0].width
        fn = self._sharded_step_fn(w, h, step)
        self.state, metrics = fn(self.state, self.tracks,
                                 stack_cameras(cams),
                                 stack_batches(batches, h, w))
        self._last_hw = (h, w)
        return metrics

    def train(self, num_iterations: Optional[int] = None):
        with jax.set_mesh(self.mesh):
            return super().train(num_iterations)
