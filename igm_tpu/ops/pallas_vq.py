"""Pallas TPU kernel: tiled nearest-codebook search (VQ-VAE hot op).

Replaces the reference's ``torch.cdist(z, embedding).argmin``
(`src/models/vqvae.py:34-37`).  Design per the TPU kernel playbook
(/opt/skills/guides/pallas_guide.md):

- grid over M-tiles of the flattened latent batch; each program loads one
  (TM, D) z tile plus the whole codebook (K, D) into VMEM;
- the (TM, K) score tile ``||e||^2 - 2 z.e`` is ONE MXU matmul plus a
  broadcast add, reduced to argmin in-register — the distance matrix never
  touches HBM (the XLA fallback materialises it when fusion fails);
- outputs int32 indices, (TM, 1)-shaped for sublane alignment.

Falls back to the XLA path (igm_tpu.ops.vq) off-TPU or for ragged shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vq_kernel(z_ref, eb_ref, esq_ref, idx_ref):
    z = z_ref[:]                       # (TM, D)
    codebook = eb_ref[:]               # (K, D)
    dots = jax.lax.dot_general(
        z, codebook,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (TM, K)
    scores = esq_ref[:] - 2.0 * dots                   # ||e||^2 - 2 z.e
    idx_ref[:] = jnp.argmin(scores, axis=1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_m",))
def nearest_codebook_pallas(z: jnp.ndarray, codebook: jnp.ndarray,
                            tile_m: int = 512) -> jnp.ndarray:
    """z: (M, D), codebook: (K, D) -> (M,) int32.  M must divide by tile_m
    (callers pad; VQ-VAE latent grids are powers of two)."""
    m, d = z.shape
    k = codebook.shape[0]
    tile_m = min(tile_m, m)
    e_sq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1)[None, :]  # (1, K)
    grid = (pl.cdiv(m, tile_m),)
    idx = pl.pallas_call(
        _vq_kernel,
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * d, bytes_accessed=(m * d + k * d + m) * 4,
            transcendentals=0),
    )(z, codebook, e_sq)
    return idx[:, 0]


def supported(z: jnp.ndarray, codebook: jnp.ndarray) -> bool:
    backend = jax.default_backend()
    m, d = z.shape
    return backend == "tpu" and m % 8 == 0 and d >= 8
