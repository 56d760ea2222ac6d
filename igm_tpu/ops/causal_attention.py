"""Causal self-attention for the TAR transformer (hot path on TPU).

Parity target: the softmax attention inside the reference's
``nn.TransformerEncoder`` (`/root/reference/src/models/tar.py:64-69`) — a
full (S, S) tril-masked attention matrix.  At TAR's S = 785 and batch 128
the materialised probs tensor is 315M elements per layer, so the torch-style
path is HBM-traffic-bound on TPU.

On TPU this dispatches to JAX's stock Pallas TPU flash-attention kernel
(blockwise online-softmax, causal block skipping — the probs matrix never
touches HBM).  The sequence is zero-padded to a multiple of the 128-lane
block size; with ``causal=True`` the padded tail positions are unreachable
from every real query, so the sliced result is EXACT (verified on-chip
against the XLA path, see tests/test_flash_attention.py).

Dropout caveat: the flash kernel has no attention-probs dropout.  Callers
that need it (train-time parity with torch's in-attention dropout) must
use the XLA path — TAR keeps flash OFF while attention dropout is active
unless ``model.flash_attention=true`` explicitly opts in (documented
divergence).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_BLOCK = 128


@functools.lru_cache(maxsize=None)
def _flash_fn(seq_pad: int, causal: bool = True):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    b = min(_BLOCK, seq_pad)
    sizes = BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
        block_q_dkv=b, block_k_major_dq=b, block_k_dq=b, block_q_dq=b)
    return functools.partial(flash_attention, causal=causal,
                             block_sizes=sizes)


def flash_causal_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           sm_scale: Optional[float] = None) -> jnp.ndarray:
    """q, k, v: (batch, seq, heads, head_dim) (the flax layout) -> same.

    Exact causal attention via the Pallas TPU flash kernel; pads seq to a
    multiple of 128 (padded keys are causally unreachable from real
    queries, padded query rows are sliced off).
    """
    n, s, h, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    s_pad = -(-s // _BLOCK) * _BLOCK
    # flax BSHD -> kernel BHSD
    qt, kt, vt = (x.swapaxes(1, 2) for x in (q, k, v))
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        qt, kt, vt = (jnp.pad(x, pad) for x in (qt, kt, vt))
    out = _flash_fn(s_pad)(qt, kt, vt, sm_scale=sm_scale)
    return out[:, :, :s, :].swapaxes(1, 2)


def flash_full_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         sm_scale: Optional[float] = None) -> jnp.ndarray:
    """Bidirectional (non-causal) flash attention for the DiT backbone.

    q, k, v: (batch, seq, heads, head_dim) -> same.  The (B, H, S, S)
    logits/probs tensors never touch HBM — at DiT-768x12's shapes
    (B=256, H=12, S=256) the XLA path materialises an 805 MB f32 logits
    tensor + 403 MB bf16 probs per block and the trace shows attention at
    ~52% of step time for ~5% of FLOPs (benchmarks/profiles/dit_trace.json).

    Unlike the causal wrapper, padding is NOT harmless here (every key is
    reachable), so the sequence length must be divisible by the 128-lane
    block; callers gate on that (DiT at patch 2 / 32px gives S=256)."""
    n, s, h, d = q.shape
    if s % _BLOCK:
        raise ValueError(
            f"flash_full_attention needs seq % {_BLOCK} == 0, got {s} "
            "(padded keys would receive softmax mass)")
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    qt, kt, vt = (x.swapaxes(1, 2) for x in (q, k, v))  # BSHD -> BHSD
    out = _flash_fn(s, causal=False)(qt, kt, vt, sm_scale=sm_scale)
    return out.swapaxes(1, 2)


def flash_attention_fn(query, key, value, bias=None, mask=None,
                       broadcast_dropout=True, dropout_rng=None,
                       dropout_rate=0.0, deterministic=True,
                       dtype=None, precision=None, module=None,
                       force_fp32_for_softmax=False):
    """Drop-in ``attention_fn`` for flax ``MultiHeadDotProductAttention``.

    Ignores ``mask`` (the caller's mask must be causal — TAR's is) and
    ``dropout_*`` (see module docstring).  ``bias`` is unsupported.
    """
    assert bias is None, "flash path does not support attention bias"
    out = flash_causal_attention(query, key, value)
    if mask is not None:
        # The kernel computes CAUSAL attention unconditionally; a caller
        # passing any other mask (padding, bidirectional) would otherwise get
        # silently wrong attention (advisor r2 finding).  The mask is a
        # tracer under jit, so the check must live in the computation: poison
        # the output with NaN unless the mask is exactly lower-triangular.
        s = query.shape[1]
        causal = jnp.tril(jnp.ones((s, s), bool))
        ok = jnp.all(mask.astype(bool).reshape(-1, s, s) == causal[None])
        out = jnp.where(ok, out, jnp.nan)
    return out


def dropout_flash_attention_fn(query, key, value, bias=None, mask=None,
                               broadcast_dropout=True, dropout_rng=None,
                               dropout_rate=0.0, deterministic=True,
                               dtype=None, precision=None, module=None,
                               force_fp32_for_softmax=False):
    """``attention_fn`` with IN-KERNEL attention-probs dropout.

    Drop-in for flax ``MultiHeadDotProductAttention`` on the TAR train
    path: causal attention + probs dropout in one Pallas kernel — the
    (B, H, S, S) probs/mask tensors never touch HBM
    (ops/pallas_dropout_attention.py).  The caller's ``mask`` must be the
    causal mask (TAR's is; the kernel computes causality itself).  Eval
    (deterministic) runs the same kernel at rate 0 == exact flash.
    """
    assert bias is None, "dropout-flash path does not support bias"
    from .pallas_dropout_attention import flash_causal_attention_dropout
    rate = 0.0 if (deterministic or dropout_rng is None) \
        else float(dropout_rate)
    seed = (jax.random.bits(dropout_rng, dtype=jnp.uint32)
            if rate > 0.0 else jnp.zeros((), jnp.uint32))
    return flash_causal_attention_dropout(query, key, value, seed, rate)


def hash_dropout_attention_fn(query, key, value, bias=None, mask=None,
                              broadcast_dropout=True, dropout_rng=None,
                              dropout_rate=0.0, deterministic=True,
                              dtype=None, precision=None, module=None,
                              force_fp32_for_softmax=False):
    """XLA attention with FUSIBLE hash-based probs dropout (TAR default).

    At TAR's shapes (S=785, batch 128) attention is COMPUTE-bound: the
    probs tensor is ~0.8 ms of HBM traffic per layer while its GEMMs are
    several ms — so a flash kernel buys nothing (measured round 3:
    the Pallas kernel at 18.5 ms/layer fwd+bwd vs XLA's ~8).  What the
    stock path DOES waste is the dropout machinery: a materialised
    bernoulli mask tensor + threefry bits (~21 ms/step).  Here the mask is
    an ELEMENTWISE function of (seed, q index, k index) — the same
    murmur-style counter hash as the Pallas kernel — which XLA fuses
    straight into the softmax consumer chain: no mask tensor, no RNG
    tensors, recomputed (not stored) in the backward.

    Distribution parity: iid Bernoulli(keep) on the normalised probs,
    exactly torch's in-attention dropout semantics (different stream, as
    cuRAND's is).
    """
    assert bias is None, "hash-dropout path does not support attention bias"
    from flax.linen.attention import dot_product_attention_weights

    from .pallas_dropout_attention import _hash_bits

    b, s, h, d = query.shape
    # flax's own weights computation (its einsum/softmax structure is what
    # XLA fuses best — a hand-rolled f32 einsum chain measured 6.3 vs
    # 10.3 steps/s on the full TAR step), dropout DISABLED here...
    probs = dot_product_attention_weights(
        query, key, bias=None, mask=mask, dropout_rate=0.0,
        deterministic=True, dtype=dtype or query.dtype,
        precision=precision)
    # ...and re-applied as an elementwise hash of (seed, b, h, q, k):
    # fuses into the probs consumer chain, no mask/RNG tensors, the
    # backward recomputes it from iotas instead of storing it
    if not deterministic and dropout_rate > 0.0 and dropout_rng is not None:
        keep = 1.0 - float(dropout_rate)
        seed = jax.random.bits(dropout_rng, dtype=jnp.uint32)
        qi = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, s, s), 2)
        kj = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, s, s), 3)
        bh = (jax.lax.broadcasted_iota(jnp.uint32, (b, h, 1, 1), 0) * h
              + jax.lax.broadcasted_iota(jnp.uint32, (b, h, 1, 1), 1))
        bits = _hash_bits(seed + bh, qi, kj)
        thresh = jnp.uint32(min(int(dropout_rate * 2 ** 32), 2 ** 32 - 1))
        probs = jnp.where(bits >= thresh,
                          probs / jnp.asarray(keep, probs.dtype),
                          jnp.zeros((), probs.dtype))
    return jnp.einsum("...hqk,...khd->...qhd", probs, value)
