"""GPipe pipeline parallelism over a ``stage`` mesh axis (TPU-native).

The reference has no pipeline story at all — its only parallelism is
Lightning-implicit DDP, disabled by default
(`/root/reference/configs/trainer/default.yaml:4`, SURVEY.md §2.2).  This
module is beyond-parity scaling infrastructure for the transformer
denoiser (networks/dit.py): when a model is deeper than one chip's HBM, the
block stack is split into S contiguous stages laid out along a ``stage``
mesh axis, and microbatches stream through the stages GPipe-style.

TPU-native design (vs a torch-RPC/NCCL pipeline):

- The schedule is a ``lax.scan`` over ``n_micro + S - 1`` ticks inside ONE
  ``jax.shard_map`` region — a single compiled SPMD program, no host
  round-trips between microbatches.
- Stage-to-stage transfer is ``lax.ppermute`` on the ``stage`` axis: a
  point-to-point ICI neighbour hop, the cheapest collective on a TPU torus.
- The BACKWARD schedule is not hand-written: ``jax.grad`` through the scan
  transposes ``ppermute`` into the reverse-direction hop and replays the
  pipeline back-to-front (activations rematerialised per block when the
  caller wraps ``block_apply`` in ``jax.checkpoint``).
- Composes with data parallelism: on a ``(data, stage)`` mesh the batch
  stays sharded over ``data`` while blocks shard over ``stage``; each data
  slice runs its own pipeline and gradient all-reduce rides the usual
  GSPMD path outside the shard_map.

Per-stage parameters are the STACKED block layout ([depth, ...] leaves,
``networks/dit.py block_mode="scan"``), sharded ``P("stage")`` on axis 0 —
each device materialises only its ``depth/S`` blocks (plus their optimizer
moments via :func:`pipeline_state_sharding`).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

STAGE_AXIS = "stage"


def make_pipeline_mesh(stage: int, data: int = 1,
                       devices: Optional[list] = None) -> Mesh:
    """2-D ``(data, stage)`` mesh: batch shards over ``data``, the block
    stack shards over ``stage``."""
    devs = list(devices if devices is not None else jax.devices())
    if data * stage > len(devs):
        raise ValueError(f"mesh ({data},{stage}) needs {data * stage} "
                         f"devices, have {len(devs)}")
    arr = mesh_utils.create_device_mesh((data, stage),
                                        devices=devs[:data * stage])
    return Mesh(arr, (DATA_AXIS, STAGE_AXIS))


def _batch_spec(mesh: Mesh) -> P:
    return P(DATA_AXIS) if DATA_AXIS in mesh.axis_names else P()


def gpipe_apply(block_apply: Callable[[Any, jnp.ndarray, jnp.ndarray],
                                      jnp.ndarray],
                stacked_params: Any, tok: jnp.ndarray, c: jnp.ndarray,
                mesh: Mesh, n_micro: int = 1) -> jnp.ndarray:
    """Run ``depth`` stacked blocks over ``tok`` through an S-stage pipeline.

    ``block_apply(one_block_params, x, c) -> x`` is the per-block function;
    ``stacked_params`` has leaves ``[depth, ...]`` (depth % S == 0);
    ``tok`` is ``[B, n, d]`` and ``c`` ``[B, dc]``, both (optionally)
    sharded over the ``data`` axis.  ``B`` must divide by
    ``n_micro * mesh.shape[data]``.

    Semantics are EXACTLY ``for each of depth blocks: tok = block(tok, c)``
    — the schedule changes execution order across devices, not math; the
    equality tests in tests/test_pipeline.py assert forward and grads match
    the sequential scan bitwise-close.
    """
    S = int(mesh.shape[STAGE_AXIS])
    leaves = jax.tree_util.tree_leaves(stacked_params)
    depth = int(leaves[0].shape[0])
    if depth % S:
        raise ValueError(f"depth {depth} not divisible by {S} stages")
    n_data = int(mesh.shape.get(DATA_AXIS, 1))
    B = int(tok.shape[0])
    M = int(n_micro)
    if M < 1 or B % (n_data * M):
        raise ValueError(f"batch {B} not divisible by data axis {n_data} "
                         f"x {M} microbatches")
    bspec = _batch_spec(mesh)

    def stage_fn(params, tok_l, c_l):
        # params leaves [depth/S, ...]; tok_l [B_loc, n, d]; c_l [B_loc, dc]
        sidx = lax.axis_index(STAGE_AXIS)
        mb = tok_l.shape[0] // M
        x_m = tok_l.reshape(M, mb, *tok_l.shape[1:])
        c_m = c_l.reshape(M, mb, *c_l.shape[1:])

        def apply_stage(x, cc):
            def body(xx, p):
                return block_apply(p, xx, cc), None
            out, _ = lax.scan(body, x, params)
            return out

        def tick(carry, t):
            buf, out = carry
            # stage 0 injects microbatch t (clipped past the drain ticks —
            # results discarded); later stages consume the ppermute buffer
            inject = lax.dynamic_index_in_dim(x_m, jnp.clip(t, 0, M - 1),
                                              0, keepdims=False)
            x_in = jnp.where(sidx == 0, inject, buf)
            m_in = jnp.clip(t - sidx, 0, M - 1)
            c_in = lax.dynamic_index_in_dim(c_m, m_in, 0, keepdims=False)
            y = apply_stage(x_in, c_in)
            # last stage banks microbatch t-(S-1) once it is real
            m_out = t - (S - 1)
            valid = (sidx == S - 1) & (m_out >= 0)
            idx = jnp.clip(m_out, 0, M - 1)
            prev = lax.dynamic_index_in_dim(out, idx, 0, keepdims=False)
            out = lax.dynamic_update_index_in_dim(
                out, jnp.where(valid, y, prev), idx, 0)
            # neighbour hop stage i -> i+1 (last stage sends nowhere;
            # stage 0 receives zeros, which it never reads)
            buf = lax.ppermute(y, STAGE_AXIS,
                               [(i, i + 1) for i in range(S - 1)])
            return (buf, out), None

        buf0 = jnp.zeros_like(x_m[0])
        out0 = jnp.zeros_like(x_m)
        (_, out), _ = lax.scan(tick, (buf0, out0), jnp.arange(M + S - 1))
        # [1, B_loc, n, d]: stitched to [S, B, ...] outside; only the last
        # stage's slice is real (selected by the caller — keeping the
        # select OUTSIDE shard_map avoids a psum whose transpose rules
        # differ under check_vma=False)
        return out.reshape(tok_l.shape)[None]

    f = jax.shard_map(
        stage_fn, mesh=mesh,
        in_specs=(P(STAGE_AXIS), bspec, bspec),
        out_specs=P(STAGE_AXIS, *bspec), check_vma=False)
    return f(stacked_params, tok, c)[S - 1]


def _has_blocks(path) -> bool:
    for k in path:
        name = getattr(k, "key", getattr(k, "name", None))
        if name == "blocks":
            return True
    return False


def pipeline_state_sharding(mesh: Mesh, tree: Any, depth: int) -> Any:
    """NamedSharding tree for a TrainState whose network uses stacked block
    params: every leaf under a ``blocks`` key (params AND the optimizer
    moments, whose trees mirror the param paths) shards its leading
    ``depth`` axis over ``stage``; everything else is replicated."""
    def spec(path, x):
        shape = getattr(x, "shape", ())
        if _has_blocks(path) and shape and int(shape[0]) == depth:
            return NamedSharding(mesh, P(STAGE_AXIS))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_pipeline_state(mesh: Mesh, tree: Any, depth: int) -> Any:
    """Place a TrainState for pipelined training: block stacks sharded over
    ``stage`` (each device holds depth/S blocks + their moments)."""
    sh = pipeline_state_sharding(mesh, tree, depth)
    return jax.tree_util.tree_map(jax.device_put, tree, sh)
