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
FSDP_AXIS = "fsdp"  # optional third axis: data x fsdp x model (TP+ZeRO)

# Leaves smaller than this stay replicated under FSDP: sharding tiny tensors
# trades an all-gather dispatch for negligible memory.
FSDP_MIN_SIZE = 2 ** 11


def make_mesh(data: int = -1, devices: Optional[list] = None,
              model: int = 1, fsdp: int = 1) -> Mesh:
    """Device mesh. ``data=-1`` uses every visible device (divided by
    ``model``/``fsdp`` when those axes are requested).

    ``model=1`` (default) keeps the 1-D data-parallel mesh; ``model>1``
    builds a 2-D ``(data, model)`` mesh for FSDP-style state sharding.
    ``fsdp>1`` (with ``model>1``) builds the composed 3-D
    ``(data, fsdp, model)`` mesh: Megatron TP over ``model``, ZeRO state
    sharding over ``fsdp`` (which is also a batch/data axis — the batch
    shards over ``data x fsdp``), pure replication over ``data``."""
    devs = list(devices if devices is not None else jax.devices())
    m = max(1, int(model or 1))
    f = max(1, int(fsdp or 1))
    if f > 1:
        if m < 2:
            raise ValueError("fsdp axis requires a model axis (use the 2-D "
                             "(data, model) mesh for FSDP-only sharding)")
        if len(devs) % (f * m):
            raise ValueError(
                f"fsdp*model {f}*{m} does not divide {len(devs)} devices")
        n = len(devs) // (f * m) if data in (-1, None) else int(data)
        n = max(1, min(n, len(devs) // (f * m)))
        mesh_devs = mesh_utils.create_device_mesh(
            (n, f, m), devices=devs[:n * f * m])
        return Mesh(mesh_devs, (DATA_AXIS, FSDP_AXIS, MODEL_AXIS))
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


def _batch_axes(mesh: Mesh):
    """Axes the batch dimension shards over: ``data``, plus ``fsdp`` on the
    composed 3-D mesh (ZeRO's shard axis is a data axis for the batch)."""
    if FSDP_AXIS in mesh.axis_names:
        return (DATA_AXIS, FSDP_AXIS)
    return DATA_AXIS


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over the data axis (and ``fsdp`` on the
    3-D mesh); trailing axes replicated."""
    return NamedSharding(mesh, P(_batch_axes(mesh)))


def chunk_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for K-step chained batches [k, B, ...]: the BATCH axis (1)
    splits over ``data``; the chunk axis stays replicated (it is scanned)."""
    return NamedSharding(mesh, P(None, _batch_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Host numpy batch -> device arrays sharded along the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(np.asarray(x), sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def _fsdp_spec(mesh: Mesh, x, axis: str = MODEL_AXIS) -> P:
    """PartitionSpec sharding ``x``'s largest ``axis``-divisible axis."""
    m = mesh.shape[axis]
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
    spec[best_dim] = axis
    return P(*spec)


# --- Tensor parallelism (Megatron-style) for transformer backbones --------
# Column-parallel matrices (fused qkv, MLP-up) shard their OUTPUT features
# over ``model``; row-parallel matrices (attention out-proj, MLP-down) shard
# their INPUT features.  With only these parameter specs, GSPMD propagates
# head-sharded activations through the whole block and inserts exactly the
# two all-reduces per block the Megatron pattern calls for (one after proj,
# one after MLP-down) — no hand-written collectives, no network changes.
# Unlike FSDP (a memory layout: params gathered before use), TP keeps the
# per-block GEMMs and the attention itself sharded, splitting the COMPUTE.
# Relies on dit.py's head-grouped qkv packing so shards hold whole heads.
_TP_COLUMN = ("qkv", "Dense_0")   # out-features over `model` (qkv, MLP-up)
_TP_ROW = ("proj", "Dense_1")     # in-features over `model` (o-proj, MLP-down)


def _path_names(path) -> list:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
        else:
            names.append(str(k))
    return names


def _tp_spec(mesh: Mesh, path, x) -> Optional[P]:
    """Megatron PartitionSpec for a DiT-block param leaf; None if no TP rule
    applies (caller falls back to FSDP).  Matches by module-path names, which
    traverse optimizer-moment trees identically to the param tree."""
    names = _path_names(path)
    if not any(n.startswith("DiTBlock") for n in names):
        return None
    if len(names) < 2:
        return None
    m = mesh.shape[MODEL_AXIS]
    shape = getattr(x, "shape", ())
    leaf, parent = names[-1], names[-2]
    if "moe" in names:
        # EXPERT parallelism: Switch-MoE stacked weights [E, ...] shard
        # their expert axis over ``model`` (networks/moe.py); GSPMD derives
        # the dispatch/combine collectives from the einsum shardings.  The
        # router stays replicated (every token scores every expert).
        if leaf in ("w_up", "w_dn", "b_up", "b_dn") and shape and \
                shape[0] % m == 0:
            spec = [None] * len(shape)
            spec[0] = MODEL_AXIS
            return P(*spec)
        return P()
    col, row = parent in _TP_COLUMN, parent in _TP_ROW
    if not (col or row):
        return None
    if leaf == "kernel" and len(shape) == 2:
        dim = 1 if col else 0
        if shape[dim] % m:
            return None
        spec = [None, None]
        spec[dim] = MODEL_AXIS
        # composed 3-D mesh: ZeRO-shard the non-TP dim over ``fsdp`` too
        if FSDP_AXIS in mesh.axis_names:
            f = mesh.shape[FSDP_AXIS]
            other = 1 - dim
            if f > 1 and shape[other] % f == 0 and \
                    int(np.prod(shape)) >= FSDP_MIN_SIZE:
                spec[other] = FSDP_AXIS
        return P(*spec)
    if leaf == "bias" and len(shape) == 1:
        if col and shape[0] % m == 0:
            return P(MODEL_AXIS)
        # row-parallel bias: added once, after the all-reduce -> replicated
        return P()
    return None


def _spec_for(mesh: Mesh, path, x, mode: str) -> P:
    if mode == "tensor":
        spec = _tp_spec(mesh, path, x)
        if spec is not None:
            return spec
    # composed 3-D mesh: non-TP leaves ZeRO-shard over the fsdp axis (the
    # model axis is reserved for TP there); 2-D mesh keeps the model axis
    axis = FSDP_AXIS if FSDP_AXIS in mesh.axis_names else MODEL_AXIS
    return _fsdp_spec(mesh, x, axis)


def shard_state(mesh: Mesh, tree: Any, mode: str = "fsdp") -> Any:
    """Place a TrainState on the mesh: replicated on a 1-D data mesh;
    sharded over ``model`` when the mesh is 2-D.  ``mode="fsdp"`` (default)
    shards each leaf's largest divisible axis (a memory layout — ZeRO-3);
    ``mode="tensor"`` applies Megatron column/row specs to transformer-block
    matrices (splitting the block compute itself) and falls back to FSDP
    specs elsewhere.  GSPMD emits every collective either way."""
    if MODEL_AXIS not in mesh.axis_names or mesh.shape[MODEL_AXIS] == 1:
        return replicate(mesh, tree)
    def _put(path, x):
        return jax.device_put(
            x, NamedSharding(mesh, _spec_for(mesh, path, x, mode)))
    return jax.tree_util.tree_map_with_path(_put, tree)


def state_shardings(mesh: Mesh, shape_tree: Any, mode: str = "fsdp") -> Any:
    """NamedSharding tree for a TrainState shape tree: replicated on a 1-D
    mesh, FSDP/TP specs on a 2-D mesh.  Use as ``jit(..., out_shardings=...)``
    so the state is BORN sharded — required in multi-process runs, where a
    post-hoc cross-host ``device_put`` reshard is not a supported path."""
    if MODEL_AXIS not in mesh.axis_names or mesh.shape[MODEL_AXIS] == 1:
        rep = replicated(mesh)
        return jax.tree_util.tree_map(lambda _: rep, shape_tree)
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, _spec_for(mesh, path, x, mode)),
        shape_tree)


def init_state_sharded(model, mesh: Mesh, rng, mode: str = "fsdp") -> Any:
    """Jit the model's init with explicit output shardings (GSPMD writes
    each shard on its owner device; no cross-host transfer ever exists)."""
    shapes = jax.eval_shape(model.init_state, rng)
    return jax.jit(model.init_state,
                   out_shardings=state_shardings(mesh, shapes, mode))(rng)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def sample_sharded(model, mesh: Mesh, state, rng, n: int, **kw):
    """Multi-chip inference: run ``model.sample`` under the mesh with the
    sample batch sharded over the data axes.

    ``out_shardings`` pins the generated batch to the data axes and GSPMD
    propagates that sharding backwards through the sampler's ``lax.scan``
    (every denoiser forward in the chain runs batch-sharded; sharded or
    replicated params both compose).  ``n`` must divide the data-axes
    product.  Math is identical to the single-device sampler — same RNG
    stream, sharding constraints change layout only."""
    per = mesh.shape[DATA_AXIS]
    if FSDP_AXIS in mesh.axis_names:
        per *= mesh.shape[FSDP_AXIS]
    if n % per:
        raise ValueError(f"sample batch {n} not divisible by data axes {per}")
    fn = jax.jit(lambda s, r: model.sample(s, r, n, **kw),
                 out_shardings=batch_sharding(mesh))
    return fn(state, rng)
