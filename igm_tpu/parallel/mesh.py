"""Device mesh + sharding helpers (the NCCL/DDP replacement).

The reference's only parallelism story is Lightning-implicit DDP, disabled by
default (`/root/reference/configs/trainer/default.yaml:4`, SURVEY.md §2.2).
Here data-parallelism is first-class and NCCL-free: one jitted train step over
a ``data`` mesh axis; the batch is sharded along ``data``, parameters are
replicated, and XLA emits the gradient all-reduce over ICI.

Beyond parity, a second ``model`` axis gives FSDP/ZeRO-style scaling: each
parameter (and its optimizer moments) has its largest divisible axis sharded
over ``model``, GSPMD inserts the forward all-gathers and gradient
reduce-scatters, and per-device HBM for state drops ~linearly in the axis
size.  Enable via ``trainer.mesh={data: N, model: M}``.

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
MODEL_AXIS = "model"

# Leaves smaller than this stay replicated under FSDP: sharding tiny tensors
# trades an all-gather dispatch for negligible memory.
FSDP_MIN_SIZE = 2 ** 11


def make_mesh(data: int = -1, devices: Optional[list] = None,
              model: int = 1) -> Mesh:
    """Device mesh. ``data=-1`` uses every visible device (divided by
    ``model`` when a model axis is requested).

    ``model=1`` (default) keeps the 1-D data-parallel mesh; ``model>1``
    builds a 2-D ``(data, model)`` mesh for FSDP-style state sharding."""
    devs = list(devices if devices is not None else jax.devices())
    m = max(1, int(model or 1))
    if m > 1:
        if len(devs) % m:
            raise ValueError(f"model axis {m} does not divide {len(devs)} devices")
        n = len(devs) // m if data in (-1, None) else int(data)
        n = max(1, min(n, len(devs) // m))
        mesh_devs = mesh_utils.create_device_mesh((n, m), devices=devs[:n * m])
        return Mesh(mesh_devs, (DATA_AXIS, MODEL_AXIS))
    n = len(devs) if data in (-1, None) else int(data)
    n = max(1, min(n, len(devs)))
    mesh_devs = mesh_utils.create_device_mesh((n,), devices=devs[:n])
    return Mesh(mesh_devs, (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over the data axis; trailing axes replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def chunk_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for K-step chained batches [k, B, ...]: the BATCH axis (1)
    splits over ``data``; the chunk axis stays replicated (it is scanned)."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Host numpy batch -> device arrays sharded along the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(np.asarray(x), sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def _fsdp_spec(mesh: Mesh, x) -> P:
    """PartitionSpec sharding ``x``'s largest ``model``-divisible axis."""
    m = mesh.shape[MODEL_AXIS]
    shape = getattr(x, "shape", ())
    if not shape or int(np.prod(shape)) < FSDP_MIN_SIZE:
        return P()
    # largest axis that divides evenly wins; ties -> later axis (output
    # features for conv kernels, which XLA all-gathers cheapest)
    best, best_dim = -1, None
    for i, d in enumerate(shape):
        if d % m == 0 and d >= best:
            best, best_dim = d, i
    if best_dim is None:
        return P()
    spec = [None] * len(shape)
    spec[best_dim] = MODEL_AXIS
    return P(*spec)


def shard_state(mesh: Mesh, tree: Any) -> Any:
    """Place a TrainState on the mesh: replicated on a 1-D data mesh;
    FSDP-sharded (params + optimizer moments alike) when the mesh has a
    ``model`` axis of size > 1.  GSPMD then emits the forward all-gathers
    and gradient reduce-scatters — no hand-written collectives."""
    if MODEL_AXIS not in mesh.axis_names or mesh.shape[MODEL_AXIS] == 1:
        return replicate(mesh, tree)
    def _put(x):
        return jax.device_put(x, NamedSharding(mesh, _fsdp_spec(mesh, x)))
    return jax.tree_util.tree_map(_put, tree)


def state_shardings(mesh: Mesh, shape_tree: Any) -> Any:
    """NamedSharding tree for a TrainState shape tree: replicated on a 1-D
    mesh, FSDP specs on a 2-D mesh.  Use as ``jit(..., out_shardings=...)``
    so the state is BORN sharded — required in multi-process runs, where a
    post-hoc cross-host ``device_put`` reshard is not a supported path."""
    if MODEL_AXIS not in mesh.axis_names or mesh.shape[MODEL_AXIS] == 1:
        rep = replicated(mesh)
        return jax.tree_util.tree_map(lambda _: rep, shape_tree)
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _fsdp_spec(mesh, x)), shape_tree)


def init_state_sharded(model, mesh: Mesh, rng) -> Any:
    """Jit the model's init with explicit output shardings (GSPMD writes
    each shard on its owner device; no cross-host transfer ever exists)."""
    shapes = jax.eval_shape(model.init_state, rng)
    return jax.jit(model.init_state,
                   out_shardings=state_shardings(mesh, shapes))(rng)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
