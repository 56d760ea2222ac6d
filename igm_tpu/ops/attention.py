"""Linear attention op (DDPM UNet hot path).

Math parity: `/root/reference/src/models/ddpm.py:146-166` — keys are
softmaxed over spatial positions, a (d x e) context is accumulated, and
queries read it out; O(N·d·e) instead of O(N²).

TPU notes: the forward dispatches to a fused Pallas kernel
(igm_tpu.ops.pallas_attention) on TPU; the backward is a custom VJP in
plain XLA einsums (same contraction count as the forward — linear attention
has no attention-matrix to rematerialise).  ``IGM_PALLAS=0`` forces the
pure-XLA path everywhere.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _xla_forward(q, k, v):
    k_sm = jax.nn.softmax(k, axis=1)
    context = jnp.einsum("bnhd,bnhe->bhde", k_sm, v,
                         preferred_element_type=jnp.float32)
    out = jnp.einsum("bnhd,bhde->bnhe", q, context,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@jax.custom_vjp
def linear_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q,k,v: (B, N, H, D) -> (B, N, H, D).

    k is softmax-normalised over N (the spatial axis), exactly like the
    reference (`ddpm.py:161`); q is used raw (no scaling — parity).
    """
    # Measured on TPU v5 lite (DDPM CIFAR-10 step, batch 256): the XLA
    # einsum path hits 10.4k imgs/s vs 8.0k with the Pallas kernel — the
    # per-(batch, head) D=32 contractions underutilise the MXU as separate
    # grid cells, while XLA batches them.  Pallas kernel kept as opt-in
    # (IGM_PALLAS_ATTN=1) for large-N regimes.
    if os.environ.get("IGM_PALLAS_ATTN", "0") == "1":
        from . import pallas_attention
        if pallas_attention.supported(q):
            return pallas_attention.linear_attention_pallas(q, k, v)
    return _xla_forward(q, k, v)


def _fwd(q, k, v):
    return linear_attention(q, k, v), (q, k, v)


# --------------------------------------------------------------------------
# Head-folded ("flat") path — the TPU default since round 3.
#
# The (B, N, H, D) head-split basis forces XLA to materialise 5-D qkv
# tensors whose einsum layouts disagree with the 1x1-conv output layout;
# the round-3 device trace (benchmarks/profiles/ddpm_trace.md) showed
# ~2.5-3 ms/step of pure layout copies from exactly that.  Folding heads
# into the channel axis (C = H*D = 128) makes every contraction a
# (B, N, C) x (B, N, C) batched GEMM in the conv's own channel-minor
# layout (zero transposes) and fills full 128-lane MXU tiles.  Cross-head
# context blocks are computed (+4x FLOPs on a term that is <1% of the
# step) and masked to block-diagonal, which is exactly per-head attention:
# out = q_flat @ blockdiag(ctx_h) == concat_h(q_h @ ctx_h).
# --------------------------------------------------------------------------

def _block_mask(heads: int, d: int, dtype) -> jnp.ndarray:
    eye = jnp.eye(heads, dtype=dtype)
    return jnp.kron(eye, jnp.ones((d, d), dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def linear_attention_flat(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          heads: int) -> jnp.ndarray:
    """q,k,v: (B, N, H*D) channel-flat -> (B, N, H*D).

    Same math as :func:`linear_attention` (softmax over N on k, per-head
    (d x d) context, raw q readout — parity `ddpm.py:146-166`), computed in
    the head-folded basis described above.
    """
    out, _ = _flat_fwd(q, k, v, heads)
    return out


def _flat_fwd(q, k, v, heads):
    c = q.shape[-1]
    mask = _block_mask(heads, c // heads, jnp.float32)
    k_sm = jax.nn.softmax(k, axis=1)
    ctx = jnp.einsum("bnc,bne->bce", k_sm, v,
                     preferred_element_type=jnp.float32) * mask
    ctx = ctx.astype(q.dtype)
    out = jnp.einsum("bnc,bce->bne", q, ctx,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype), (q, k, v, ctx)


def _flat_bwd(heads, res, g):
    q, k, v, ctx = res
    f32 = jnp.float32
    c = q.shape[-1]
    mask = _block_mask(heads, c // heads, f32)
    k_sm = jax.nn.softmax(k.astype(f32), axis=1)
    gf = g.astype(f32)
    dq = jnp.einsum("bne,bce->bnc", gf, ctx.astype(f32))
    dctx = jnp.einsum("bnc,bne->bce", q.astype(f32), gf) * mask
    dv = jnp.einsum("bnc,bce->bne", k_sm, dctx)
    dk_sm = jnp.einsum("bce,bne->bnc", dctx, v.astype(f32))
    inner = jnp.sum(k_sm * dk_sm, axis=1, keepdims=True)
    dk = k_sm * (dk_sm - inner)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


linear_attention_flat.defvjp(
    lambda q, k, v, heads: _flat_fwd(q, k, v, heads),
    _flat_bwd)


def _bwd(res, g):
    q, k, v = res
    f32 = jnp.float32
    k_sm = jax.nn.softmax(k.astype(f32), axis=1)
    qf, vf, gf = q.astype(f32), v.astype(f32), g.astype(f32)
    context = jnp.einsum("bnhd,bnhe->bhde", k_sm, vf)
    dq = jnp.einsum("bnhe,bhde->bnhd", gf, context)
    dcontext = jnp.einsum("bnhd,bnhe->bhde", qf, gf)
    dv = jnp.einsum("bnhd,bhde->bnhe", k_sm, dcontext)
    dk_sm = jnp.einsum("bhde,bnhe->bnhd", dcontext, vf)
    # softmax backward over axis 1 (per batch/head/feature column)
    inner = jnp.sum(k_sm * dk_sm, axis=1, keepdims=True)
    dk = k_sm * (dk_sm - inner)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


linear_attention.defvjp(_fwd, _bwd)
