"""Linear attention op (DDPM UNet hot path).

Math parity: `/root/reference/src/models/ddpm.py:146-166` — keys are
softmaxed over spatial positions, a (d x e) context is accumulated, and
queries read it out; O(N·d·e) instead of O(N²).

TPU notes: expressed as two batched matmuls over the (pixels, head_dim)
axes so XLA tiles them onto the MXU; the softmax+matmul chain fuses.  A
Pallas fused kernel lives in `igm_tpu.ops.pallas_attention` and is used when
the spatial extent is large enough to pay off.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q,k,v: (B, N, H, D) -> (B, N, H, D).

    k is softmax-normalised over N (the spatial axis), exactly like the
    reference (`ddpm.py:161`); q is used raw (no scaling — parity).
    """
    k = jax.nn.softmax(k, axis=1)
    # context[b,h,d,e] = sum_n k[b,n,h,d] * v[b,n,h,e]
    context = jnp.einsum("bnhd,bnhe->bhde", k, v,
                         preferred_element_type=jnp.float32)
    # out[b,n,h,e] = sum_d q[b,n,h,d] * context[b,h,d,e]
    out = jnp.einsum("bnhd,bhde->bnhe", q, context,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
