"""Pallas TPU kernel: fused linear attention (DDPM UNet hot path).

One program per (batch, head): softmax(k over pixels), the (D, D) context
contraction and the q read-out all stay in VMEM — k/v/q are each read from
HBM exactly once and nothing of size (N, N) or (N, D) is written back
between stages (the XLA path emits softmax -> matmul -> matmul with
intermediates in HBM when fusion caps are hit at large N).

Math parity with `src/models/ddpm.py:146-166` via igm_tpu.ops.attention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _linattn_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]                        # (N, D)
    k = k_ref[0]
    v = v_ref[0]
    # softmax over the pixel axis (axis 0), numerically stable
    k_max = jnp.max(k, axis=0, keepdims=True)
    k_exp = jnp.exp(k - k_max)
    k_sm = k_exp / jnp.sum(k_exp, axis=0, keepdims=True)
    # context[d, e] = sum_n k_sm[n, d] v[n, e]   — (D, D) on the MXU
    context = jax.lax.dot_general(
        k_sm, v, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # out[n, e] = sum_d q[n, d] context[d, e]
    o_ref[0] = jnp.dot(q, context,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


@jax.jit
def linear_attention_pallas(q: jnp.ndarray, k: jnp.ndarray,
                            v: jnp.ndarray) -> jnp.ndarray:
    """q,k,v: (B, N, H, D) -> (B, N, H, D); one grid cell per (b, h)."""
    b, n, h, d = q.shape
    # (B, N, H, D) -> (B*H, N, D) so each program owns a contiguous block
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    out = pl.pallas_call(
        _linattn_kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(b * h,),
            in_specs=[pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * d * d,
            bytes_accessed=4 * b * h * n * d * 4,
            transcendentals=b * h * n * d),
    )(qb, kb, vb)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def supported(q: jnp.ndarray) -> bool:
    b, n, h, d = q.shape
    # VMEM budget: 4 buffers of (N, D) f32 per program
    return (jax.default_backend() == "tpu" and n * d * 4 * 4 < 8 * 2 ** 20
            and n >= 64)
