"""Vector-quantization ops: nearest-codebook search.

Parity target: `src/models/vqvae.py:34-37` (torch.cdist + argmin).

TPU design: the distance matrix is ONE (M, D) x (D, K) matmul on the MXU
(||z||^2 is constant w.r.t. the argmin and dropped), fused with the argmin
reduction by XLA.  A Pallas tiled variant lives in
``igm_tpu.ops.pallas_vq`` for large M·K (keeps the (M,K) distance tile in
VMEM, never materialising it in HBM).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_codebook(z: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """z: (M, D), codebook: (K, D) -> int32 (M,) indices of nearest code.

    Euclidean nearest neighbour; ties broken toward the lower index
    (jnp.argmin semantics, same as torch.argmin).
    """
    import os
    if os.environ.get("IGM_PALLAS", "1") == "1":
        from . import pallas_vq
        if pallas_vq.supported(z, codebook):
            # argmin is piecewise-constant: zero gradient, so cut the AD
            # graph here (pallas_call has no JVP rule; torch.argmin is
            # equally non-differentiable).
            return pallas_vq.nearest_codebook_pallas(
                jax.lax.stop_gradient(z), jax.lax.stop_gradient(codebook))
    # ||z - e||^2 = ||z||^2 - 2 z.e + ||e||^2 ; ||z||^2 is row-constant.
    dots = jnp.dot(z, codebook.T, preferred_element_type=jnp.float32)
    e_sq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1)
    scores = e_sq[None, :] - 2.0 * dots
    return jnp.argmin(scores, axis=1).astype(jnp.int32)


def quantize(z: jnp.ndarray, codebook: jnp.ndarray):
    """Returns (quantized vectors, indices).

    ``jnp.asarray`` on the gather: an orbax-restored state has NUMPY
    leaves, and ``np.ndarray[tracer]`` raises TracerArrayConversionError
    at trace time — the one place the codebook is INDEXED rather than
    combined through jnp ops (hit by tools/export.py for latent-DDPM,
    round 5b; every other family's restored params only flow into jnp
    primitives, which coerce numpy operands themselves)."""
    idx = nearest_codebook(z, codebook)
    return jnp.asarray(codebook)[idx], idx
