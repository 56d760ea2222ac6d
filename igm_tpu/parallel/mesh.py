"""Device mesh + sharding helpers (the NCCL/DDP replacement).

The reference's only parallelism story is Lightning-implicit DDP, disabled by
default (`/root/reference/configs/trainer/default.yaml:4`, SURVEY.md §2.2).
Here data-parallelism is first-class and NCCL-free: one jitted train step over
a 1-D ``data`` mesh axis; the batch is sharded along ``data``, parameters are
replicated, and XLA emits the gradient all-reduce over ICI.

Multi-host scaling uses the same code path: call
``jax.distributed.initialize()`` before ``make_mesh`` and the mesh spans all
processes (collectives ride ICI within a slice, DCN across slices).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(data: int = -1, devices: Optional[list] = None) -> Mesh:
    """1-D data-parallel mesh. ``data=-1`` uses every visible device."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs) if data in (-1, None) else int(data)
    n = max(1, min(n, len(devs)))
    mesh_devs = mesh_utils.create_device_mesh((n,), devices=devs[:n])
    return Mesh(mesh_devs, (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over the data axis; trailing axes replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Host numpy batch -> device arrays sharded along the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(np.asarray(x), sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
