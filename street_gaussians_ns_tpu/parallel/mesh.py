"""Device mesh construction for the (data, model) parallel layout.

The reference is strictly single-GPU (SURVEY.md §2.4); this layer is the
new TPU-native capability: 'data' shards cameras (one frame per data row,
gradient psum — the 3DGS analog of batch DP), 'model' shards Gaussian
primitives and image tiles inside one render (the analog of tensor/context
parallelism). Collectives are expressed in shard_map and compiled by XLA
onto ICI (in-slice) / DCN (cross-host after jax.distributed.initialize).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: Optional[int] = None,
              devices=None) -> Mesh:
    """Mesh over all (or given) devices with axes ('data', 'model')."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None and model is None:
        model = 1
        data = n
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    # Both axes given smaller than the machine: use the first data*model
    # devices (lets tests and partial-machine runs pick a sub-mesh).
    return Mesh(devices[:data * model].reshape(data, model),
                ("data", "model"))


def multihost_init(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Multi-host entry: jax.distributed over DCN. No-op if single host and
    no coordinator given."""
    if coordinator is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Leading axis across 'data'."""
    return NamedSharding(mesh, P("data"))


def model_sharded(mesh: Mesh) -> NamedSharding:
    """Leading (capacity) axis across 'model'."""
    return NamedSharding(mesh, P("model"))
