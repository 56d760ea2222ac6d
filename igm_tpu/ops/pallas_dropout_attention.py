"""Flash causal attention WITH in-kernel attention-probs dropout (Pallas).

Why this kernel exists: the reference's transformer applies dropout to the
attention probabilities (`/root/reference/src/models/tar.py:64-69` via torch
``nn.TransformerEncoderLayer``).  On TPU the XLA path must then materialise
the (B, H, S, S) probs tensor AND its dropout mask in HBM — at TAR's
S = 785, batch 128 that is ~630 MB of probs per layer per direction plus
mask traffic, measured at 22 ms of the 97 ms step (NOTES.md round 3).  The
stock Pallas flash kernel avoids the materialisation but has NO dropout, so
using it breaks training parity.  This kernel closes the gap:

- online-softmax causal attention, probs never leave VMEM
- dropout applied to the normalised probabilities exactly like flax/torch
  (mask ~ Bernoulli(keep), out = (p * mask / keep) @ v), with the mask
  generated IN the kernel from a counter-based hash (xxhash-style mixing)
  of (seed, global query index, global key index) — the backward pass
  regenerates the identical mask from the same seed, so nothing is stored
- full custom VJP: dq, dk, dv recompute probs + mask blockwise (flash
  backward), using the saved per-row logsumexp

Layouts: inputs (B, S, H, D) (the flax convention); internally (B*H) is the
leading grid axis.  S is padded to a multiple of 128; padded keys are
causally unreachable, padded query rows are sliced off.  Scores/probs/
accumulators are f32; q/k/v may be bf16.

Statistical parity note: the mask stream differs from flax's threefry (as
torch's cuRAND differs from both); the distribution is iid Bernoulli(keep)
per (q, k) position, independent across layers via the seed.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK = 128
_U32 = jnp.uint32


def _hash_bits(seed, qi, kj):
    """Counter-based 32-bit hash (murmur3-style finalizer mixing).

    seed: u32 scalar; qi, kj: u32 arrays (broadcastable).  Returns u32
    pseudo-random bits, deterministic in (seed, qi, kj)."""
    h = (qi * _U32(0x9E3779B1)) ^ (kj * _U32(0x85EBCA77)) ^ seed
    h = h ^ (h >> 16)
    h = h * _U32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _U32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _dropout_scale(seed, rate, q_base, k_base, shape):
    """(BLOCK, BLOCK) f32 factor: mask/keep, from global q/k indices."""
    keep = 1.0 - rate
    qi = (q_base + jax.lax.broadcasted_iota(_U32, shape, 0))
    kj = (k_base + jax.lax.broadcasted_iota(_U32, shape, 1))
    bits = _hash_bits(seed, qi, kj)
    # keep iff bits >= rate * 2^32  (exact-threshold Bernoulli(keep))
    thresh = _U32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    return jnp.where(bits >= thresh, 1.0 / keep, 0.0).astype(jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, seed_ref, o_ref, lse_ref, *,
                sm_scale: float, rate: float, blocks: int):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * sm_scale          # (BLOCK, D)
    seed = seed_ref[0] + _U32(pl.program_id(0))          # per-(b,h) stream

    def body(j, carry):
        m_i, l_i, acc = carry
        k = k_ref[0, pl.dslice(j * BLOCK, BLOCK), :].astype(jnp.float32)
        v = v_ref[0, pl.dslice(j * BLOCK, BLOCK), :].astype(jnp.float32)
        s = q @ k.T                                      # (BLOCK, BLOCK)
        # causal mask within the diagonal block
        q_idx = qi * BLOCK + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_idx = j * BLOCK + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(q_idx >= k_idx, s, -jnp.inf)
        m_new = jnp.maximum(m_i, s.max(axis=1))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_i * alpha + p.sum(axis=1)
        if rate > 0.0:
            p = p * _dropout_scale(seed, rate, _U32(qi * BLOCK),
                                   _U32(j * BLOCK), s.shape)
        acc = acc * alpha[:, None] + p @ v
        return m_new, l_new, acc

    m0 = jnp.full((BLOCK,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((BLOCK,), jnp.float32)
    acc0 = jnp.zeros((BLOCK, q.shape[-1]), jnp.float32)
    # causal: only key blocks 0..qi contribute
    m_i, l_i, acc = jax.lax.fori_loop(0, qi + 1, body, (m0, l0, acc0))
    o_ref[0] = (acc / l_i[:, None]).astype(o_ref.dtype)
    lse_ref[0] = m_i + jnp.log(l_i)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref,
               dq_ref, *, sm_scale: float, rate: float, blocks: int):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * sm_scale
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]
    seed = seed_ref[0] + _U32(pl.program_id(0))

    def body(j, dq):
        k = k_ref[0, pl.dslice(j * BLOCK, BLOCK), :].astype(jnp.float32)
        v = v_ref[0, pl.dslice(j * BLOCK, BLOCK), :].astype(jnp.float32)
        s = q @ k.T
        q_idx = qi * BLOCK + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_idx = j * BLOCK + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(q_idx >= k_idx, s, -jnp.inf)
        p = jnp.exp(s - lse[:, None])                    # true softmax probs
        g = do @ v.T                                     # (BLOCK, BLOCK)
        if rate > 0.0:
            g = g * _dropout_scale(seed, rate, _U32(qi * BLOCK),
                                   _U32(j * BLOCK), s.shape)
        ds = p * (g - delta[:, None])                    # softmax vjp
        return dq + ds @ k
    dq = jax.lax.fori_loop(
        0, qi + 1, body, jnp.zeros((BLOCK, q.shape[-1]), jnp.float32))
    dq_ref[0] = (dq * sm_scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref,
                dk_ref, dv_ref, *, sm_scale: float, rate: float,
                blocks: int):
    ki = pl.program_id(1)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    seed = seed_ref[0] + _U32(pl.program_id(0))

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.dslice(i * BLOCK, BLOCK), :].astype(jnp.float32) * sm_scale
        do = do_ref[0, pl.dslice(i * BLOCK, BLOCK), :].astype(jnp.float32)
        lse = lse_ref[0, pl.dslice(i * BLOCK, BLOCK)]
        delta = delta_ref[0, pl.dslice(i * BLOCK, BLOCK)]
        s = q @ k.T                                      # (Bq, Bk)
        q_idx = i * BLOCK + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_idx = ki * BLOCK + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(q_idx >= k_idx, s, -jnp.inf)
        p = jnp.exp(s - lse[:, None])
        scale = (_dropout_scale(seed, rate, _U32(i * BLOCK),
                                _U32(ki * BLOCK), s.shape)
                 if rate > 0.0 else 1.0)
        dv = dv + (p * scale).T @ do
        g = do @ v.T
        if rate > 0.0:
            g = g * scale
        ds = p * (g - delta[:, None])
        dk = dk + ds.T @ q                               # q already scaled
        return dk, dv

    z = jnp.zeros((BLOCK, k.shape[-1]), jnp.float32)
    # causal: only query blocks ki..blocks-1 see key block ki
    dk, dv = jax.lax.fori_loop(ki, blocks, body, (z, z))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_bhsd(x, s_pad):
    b, s, h, d = x.shape
    x = x.swapaxes(1, 2).reshape(b * h, s, d)
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
    return x


def _call_fwd(q3, k3, v3, seed, sm_scale, rate, interpret):
    bh, s_pad, d = q3.shape
    blocks = s_pad // BLOCK
    kern = functools.partial(_fwd_kernel, sm_scale=sm_scale, rate=rate,
                             blocks=blocks)
    return pl.pallas_call(
        kern,
        grid=(bh, blocks),
        in_specs=[
            pl.BlockSpec((1, BLOCK, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1,), lambda b, i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, BLOCK), lambda b, i: (b, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, s_pad), jnp.float32),
        ],
        interpret=interpret,
    )(q3, k3, v3, seed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_causal_attention_dropout(q, k, v, seed, rate: float = 0.0,
                                   sm_scale: Optional[float] = None,
                                   interpret: bool = False):
    """q, k, v: (B, S, H, D); seed: u32 scalar array.  Returns (B, S, H, D).

    ``rate`` is the attention-probs dropout rate (0 disables, exact flash).
    """
    out, _ = _vjp_fwd(q, k, v, seed, rate, sm_scale, interpret)
    return out


def _resolve_scale(d, sm_scale):
    return (1.0 / (d ** 0.5)) if sm_scale is None else sm_scale


def _vjp_fwd(q, k, v, seed, rate, sm_scale, interpret):
    b, s, h, d = q.shape
    scale = _resolve_scale(d, sm_scale)
    s_pad = -(-s // BLOCK) * BLOCK
    q3, k3, v3 = (_pad_bhsd(x, s_pad) for x in (q, k, v))
    seed = seed.astype(_U32).reshape((1,))
    o3, lse = _call_fwd(q3, k3, v3, seed, scale, rate, interpret)
    out = o3.reshape(b, h, s_pad, d)[:, :, :s].swapaxes(1, 2)
    return out.astype(q.dtype), (q, k, v, seed, lse)


def _vjp_bwd(rate, sm_scale, interpret, res, g):
    q, k, v, seed, lse = res
    b, s, h, d = q.shape
    scale = _resolve_scale(d, sm_scale)
    s_pad = -(-s // BLOCK) * BLOCK
    blocks = s_pad // BLOCK
    bh = b * h
    q3, k3, v3, do3 = (_pad_bhsd(x, s_pad) for x in (q, k, v, g))
    # recompute o for delta = rowsum(do * o) (saves storing o)
    o3, _ = _call_fwd(q3, k3, v3, seed, scale, rate, interpret)
    delta = (do3.astype(jnp.float32) * o3.astype(jnp.float32)).sum(-1)

    dq_kern = functools.partial(_dq_kernel, sm_scale=scale, rate=rate,
                                blocks=blocks)
    dq3 = pl.pallas_call(
        dq_kern,
        grid=(bh, blocks),
        in_specs=[
            pl.BlockSpec((1, BLOCK, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, s_pad, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, s_pad, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, BLOCK, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, BLOCK), lambda b_, i: (b_, i)),
            pl.BlockSpec((1, BLOCK), lambda b_, i: (b_, i)),
            pl.BlockSpec((1,), lambda b_, i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK, d), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
        interpret=interpret,
    )(q3, k3, v3, do3, lse, delta, seed)

    dkv_kern = functools.partial(_dkv_kernel, sm_scale=scale, rate=rate,
                                 blocks=blocks)
    dk3, dv3 = pl.pallas_call(
        dkv_kern,
        grid=(bh, blocks),
        in_specs=[
            pl.BlockSpec((1, s_pad, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, BLOCK, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, BLOCK, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, s_pad, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, s_pad), lambda b_, i: (b_, 0)),
            pl.BlockSpec((1, s_pad), lambda b_, i: (b_, 0)),
            pl.BlockSpec((1,), lambda b_, i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, BLOCK, d), lambda b_, i: (b_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, s_pad, d), v.dtype),
        ],
        interpret=interpret,
    )(q3, k3, v3, do3, lse, delta, seed)

    def unpack(x3):
        return x3.reshape(b, h, s_pad, d)[:, :, :s].swapaxes(1, 2)

    return unpack(dq3), unpack(dk3), unpack(dv3), None


flash_causal_attention_dropout.defvjp(_vjp_fwd, _vjp_bwd)


def reference_probs_dropout_mask(seed, b, h, s, rate):
    """Host-side reconstruction of the kernel's dropout mask (tests)."""
    import numpy as np
    masks = np.zeros((b * h, s, s), np.float32)
    keep = 1.0 - rate
    thresh = min(int(rate * 2 ** 32), 2 ** 32 - 1)
    for bh in range(b * h):
        sd = np.uint32(seed + bh)
        qi = np.arange(s, dtype=np.uint64)[:, None]
        kj = np.arange(s, dtype=np.uint64)[None, :]
        with np.errstate(over="ignore"):
            hsh = (qi.astype(np.uint32) * np.uint32(0x9E3779B1)) \
                ^ (kj.astype(np.uint32) * np.uint32(0x85EBCA77)) ^ sd
            hsh = hsh ^ (hsh >> np.uint32(16))
            hsh = hsh * np.uint32(0x85EBCA6B)
            hsh = hsh ^ (hsh >> np.uint32(13))
            hsh = hsh * np.uint32(0xC2B2AE35)
            hsh = hsh ^ (hsh >> np.uint32(16))
        masks[bh] = np.where(hsh >= np.uint32(thresh), 1.0 / keep, 0.0)
    return masks.reshape(b, h, s, s)
