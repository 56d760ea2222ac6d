"""Flash causal attention WITH in-kernel attention-probs dropout (Pallas).

Why this kernel exists: the reference's transformer applies dropout to the
attention probabilities (`/root/reference/src/models/tar.py:64-69` via torch
``nn.TransformerEncoderLayer``).  On TPU the XLA path must materialise the
(B, H, S, S) probs tensor AND its dropout mask in HBM — at TAR's S = 785,
batch 128 that is ~630 MB of probs per layer per direction plus mask
traffic, measured at ~21 ms of the 97 ms step (NOTES.md round 3).  The
stock Pallas flash kernel avoids the materialisation but has NO dropout,
so using it breaks training parity.  This kernel closes the gap:

- online-softmax causal attention, probs never leave VMEM
- dropout applied to the normalised probabilities exactly like flax/torch
  (mask ~ Bernoulli(keep), out = (p * mask / keep) @ v), with the mask
  generated IN the kernel from a counter-based hash (murmur-style mixing)
  of (seed, global query index, global key index) — the backward pass
  regenerates the identical mask from the same seed, so nothing is stored
- full custom VJP (dq kernel + dk/dv kernel) using the saved per-row
  logsumexp and the saved forward output (delta = rowsum(do * o))

Kernel structure (v2 — the v1 serial-fori form ran at ~10% efficiency):
the key/value block index is the INNERMOST GRID AXIS with VMEM scratch
accumulators carried across it, so Pallas double-buffers the HBM block
loads behind the MXU; score GEMMs take bf16 operands with f32
accumulation (``preferred_element_type``), probs are cast back to the
operand dtype for the p @ v GEMM (standard flash practice), and
causally-dead blocks short-circuit via ``pl.when``.

Layouts: inputs (B, S, H, D) (the flax convention); internally (B*H) is
the leading grid axis.  S pads to a multiple of the block size; padded
keys are causally unreachable, padded query rows are sliced off.

Statistical parity note: the mask stream differs from flax's threefry (as
torch's cuRAND differs from both); the distribution is iid Bernoulli(keep)
per (q, k) position.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU scratch spaces + grid semantics; interpret mode needs neither
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

BLOCK_Q = 512
BLOCK_K = 512
_U32 = jnp.uint32
_NEG_INF = -1e30


def _hash_bits(seed, qi, kj):
    """Counter-based 32-bit hash (murmur3-style finalizer mixing)."""
    h = (qi * _U32(0x9E3779B1)) ^ (kj * _U32(0x85EBCA77)) ^ seed
    h = h ^ (h >> 16)
    h = h * _U32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _U32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _dropout_scale(seed, rate, q_base, k_base, shape):
    """(bq, bk) f32 factor mask/keep from GLOBAL q/k indices."""
    keep = 1.0 - rate
    qi = q_base + jax.lax.broadcasted_iota(_U32, shape, 0)
    kj = k_base + jax.lax.broadcasted_iota(_U32, shape, 1)
    bits = _hash_bits(seed, qi, kj)
    thresh = _U32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    return jnp.where(bits >= thresh, 1.0 / keep, 0.0).astype(jnp.float32)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, seed_ref, o_ref, lse_ref,
                m_s, l_s, acc_s, *, sm_scale: float, rate: float,
                n_k: int):
    qi, kj = pl.program_id(1), pl.program_id(2)
    seed = seed_ref[0] + _U32(pl.program_id(0))

    @pl.when(kj == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, _NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(kj * BLOCK_K <= qi * BLOCK_Q + BLOCK_Q - 1)
    def _compute():
        q, k, v = q_ref[0], k_ref[0], v_ref[0]
        s = _dot(q, k, (((1,), (1,)))) * sm_scale        # (BQ, BK) f32
        q_idx = qi * BLOCK_Q + jax.lax.broadcasted_iota(jnp.int32,
                                                        s.shape, 0)
        k_idx = kj * BLOCK_K + jax.lax.broadcasted_iota(jnp.int32,
                                                        s.shape, 1)
        s = jnp.where(q_idx >= k_idx, s, _NEG_INF)
        m_prev = m_s[:, 0]
        m_new = jnp.maximum(m_prev, s.max(axis=1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_s[:, 0] = l_s[:, 0] * alpha + p.sum(axis=1)
        m_s[:, 0] = m_new
        if rate > 0.0:
            p = p * _dropout_scale(seed, rate, _U32(qi * BLOCK_Q),
                                   _U32(kj * BLOCK_K), p.shape)
        acc_s[...] = (acc_s[...] * alpha[:, None]
                      + _dot(p.astype(v.dtype), v, ((1,), (0,))))

    @pl.when(kj == n_k - 1)
    def _finalize():
        l = l_s[:, 0]
        o_ref[0] = (acc_s[...] / l[:, None]).astype(o_ref.dtype)
        lse_ref[0] = (m_s[:, 0] + jnp.log(l))[:, None]


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref,
               dq_ref, dq_s, *, sm_scale: float, rate: float, n_k: int):
    qi, kj = pl.program_id(1), pl.program_id(2)
    seed = seed_ref[0] + _U32(pl.program_id(0))

    @pl.when(kj == 0)
    def _init():
        dq_s[...] = jnp.zeros_like(dq_s)

    @pl.when(kj * BLOCK_K <= qi * BLOCK_Q + BLOCK_Q - 1)
    def _compute():
        q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        lse = lse_ref[0, :, 0]
        delta = delta_ref[0, :, 0]
        s = _dot(q, k, ((1,), (1,))) * sm_scale
        q_idx = qi * BLOCK_Q + jax.lax.broadcasted_iota(jnp.int32,
                                                        s.shape, 0)
        k_idx = kj * BLOCK_K + jax.lax.broadcasted_iota(jnp.int32,
                                                        s.shape, 1)
        s = jnp.where(q_idx >= k_idx, s, _NEG_INF)
        p = jnp.exp(s - lse[:, None])
        g = _dot(do, v, ((1,), (1,)))
        if rate > 0.0:
            g = g * _dropout_scale(seed, rate, _U32(qi * BLOCK_Q),
                                   _U32(kj * BLOCK_K), g.shape)
        ds = p * (g - delta[:, None])
        dq_s[...] += _dot(ds.astype(k.dtype), k, ((1,), (0,)))

    @pl.when(kj == n_k - 1)
    def _finalize():
        dq_ref[0] = (dq_s[...] * sm_scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref,
                dk_ref, dv_ref, dk_s, dv_s, *, sm_scale: float, rate: float,
                n_q: int):
    ki, qj = pl.program_id(1), pl.program_id(2)
    seed = seed_ref[0] + _U32(pl.program_id(0))

    @pl.when(qj == 0)
    def _init():
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)

    @pl.when(qj * BLOCK_Q + BLOCK_Q - 1 >= ki * BLOCK_K)
    def _compute():
        k, v = k_ref[0], v_ref[0]                        # (BK, D)
        q, do = q_ref[0], do_ref[0]                      # (BQ, D)
        lse = lse_ref[0, :, 0]
        delta = delta_ref[0, :, 0]
        s = _dot(q, k, ((1,), (1,))) * sm_scale          # (BQ, BK)
        q_idx = qj * BLOCK_Q + jax.lax.broadcasted_iota(jnp.int32,
                                                        s.shape, 0)
        k_idx = ki * BLOCK_K + jax.lax.broadcasted_iota(jnp.int32,
                                                        s.shape, 1)
        s = jnp.where(q_idx >= k_idx, s, _NEG_INF)
        p = jnp.exp(s - lse[:, None])
        scale = (_dropout_scale(seed, rate, _U32(qj * BLOCK_Q),
                                _U32(ki * BLOCK_K), s.shape)
                 if rate > 0.0 else None)
        pt = p * scale if scale is not None else p
        dv_s[...] += _dot(pt.astype(do.dtype), do, ((0,), (0,)))
        g = _dot(do, v, ((1,), (1,)))
        if scale is not None:
            g = g * scale
        ds = p * (g - delta[:, None])
        dk_s[...] += _dot(ds.astype(q.dtype), q, ((0,), (0,))) * sm_scale

    @pl.when(qj == n_q - 1)
    def _finalize():
        dk_ref[0] = dk_s[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_s[...].astype(dv_ref.dtype)


def _pad_bhsd(x, s_pad):
    b, s, h, d = x.shape
    x = x.swapaxes(1, 2).reshape(b * h, s, d)
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
    return x


def _scratch(shapes):
    assert pltpu is not None
    return [pltpu.VMEM(s, jnp.float32) for s in shapes]


def _extra(interpret):
    """Scratch + grid-semantics kwargs (shared by all three calls)."""
    kw = {"interpret": interpret}
    if not interpret and pltpu is not None:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    return kw


def _call_fwd(q3, k3, v3, seed, sm_scale, rate, interpret):
    bh, s_pad, d = q3.shape
    n_q, n_k = s_pad // BLOCK_Q, s_pad // BLOCK_K
    kern = functools.partial(_fwd_kernel, sm_scale=sm_scale, rate=rate,
                             n_k=n_k)
    return pl.pallas_call(
        kern,
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, BLOCK_K, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, BLOCK_K, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1,), lambda b, i, j: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, s_pad, 1), jnp.float32),
        ],
        scratch_shapes=_scratch([(BLOCK_Q, 1), (BLOCK_Q, 1),
                                 (BLOCK_Q, d)]),
        **_extra(interpret),
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
    blk = max(BLOCK_Q, BLOCK_K)
    s_pad = -(-s // blk) * blk
    q3, k3, v3 = (_pad_bhsd(x, s_pad) for x in (q, k, v))
    seed = seed.astype(_U32).reshape((1,))
    o3, lse = _call_fwd(q3, k3, v3, seed, scale, rate, interpret)
    out = o3.reshape(b, h, s_pad, d)[:, :, :s].swapaxes(1, 2)
    return out.astype(q.dtype), (q, k, v, seed, o3, lse)


def _vjp_bwd(rate, sm_scale, interpret, res, g):
    q, k, v, seed, o3, lse = res
    b, s, h, d = q.shape
    scale = _resolve_scale(d, sm_scale)
    s_pad = o3.shape[1]
    n_q, n_k = s_pad // BLOCK_Q, s_pad // BLOCK_K
    bh = b * h
    q3, k3, v3, do3 = (_pad_bhsd(x, s_pad) for x in (q, k, v, g))
    delta = (do3.astype(jnp.float32)
             * o3.astype(jnp.float32)).sum(-1, keepdims=True)

    dq_kern = functools.partial(_dq_kernel, sm_scale=scale, rate=rate,
                                n_k=n_k)
    dq3 = pl.pallas_call(
        dq_kern,
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, BLOCK_K, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, BLOCK_K, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, BLOCK_Q, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1,), lambda b_, i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, d),
                               lambda b_, i, j: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
        scratch_shapes=_scratch([(BLOCK_Q, d)]),
        **_extra(interpret),
    )(q3, k3, v3, do3, lse, delta, seed)

    dkv_kern = functools.partial(_dkv_kernel, sm_scale=scale, rate=rate,
                                 n_q=n_q)
    dk3, dv3 = pl.pallas_call(
        dkv_kern,
        grid=(bh, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, BLOCK_K, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, BLOCK_K, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, BLOCK_Q, d), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1,), lambda b_, i, j: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_K, d), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, BLOCK_K, d), lambda b_, i, j: (b_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, s_pad, d), v.dtype),
        ],
        scratch_shapes=_scratch([(BLOCK_K, d), (BLOCK_K, d)]),
        **_extra(interpret),
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
        qi = np.arange(s, dtype=np.uint32)[:, None]
        kj = np.arange(s, dtype=np.uint32)[None, :]
        with np.errstate(over="ignore"):
            hsh = (qi * np.uint32(0x9E3779B1)) \
                ^ (kj * np.uint32(0x85EBCA77)) ^ sd
            hsh = hsh ^ (hsh >> np.uint32(16))
            hsh = hsh * np.uint32(0x85EBCA6B)
            hsh = hsh ^ (hsh >> np.uint32(13))
            hsh = hsh * np.uint32(0xC2B2AE35)
            hsh = hsh ^ (hsh >> np.uint32(16))
        masks[bh] = np.where(hsh >= np.uint32(thresh), 1.0 / keep, 0.0)
    return masks.reshape(b, h, s, s)
