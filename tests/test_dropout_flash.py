"""Fused causal-attention-with-probs-dropout Pallas kernel (interpret mode).

Correctness contract (ops/pallas_dropout_attention.py): with the SAME
dropout mask, the kernel's forward and all three gradients must match a
plain XLA reference that materialises probs — the mask is reconstructed
host-side from the kernel's counter-based hash, so the comparison is exact
math, not statistics.  Also: rate=0 equals exact causal attention, the
empirical drop fraction matches the rate, and S not a multiple of the 128
block exercises the padding path.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from igm_tpu.ops.pallas_dropout_attention import (  # noqa: E402
    flash_causal_attention_dropout, reference_probs_dropout_mask)

B, S, H, D = 2, 200, 2, 64  # S deliberately not a multiple of 128


def _ref_attn(q, k, v, mask_scale=None):
    scale = 1.0 / np.sqrt(D)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    causal = jnp.tril(jnp.ones((S, S), bool))
    s = jnp.where(causal[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    if mask_scale is not None:
        p = p * mask_scale
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    return tuple(jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
                 for _ in range(3))


def test_rate_zero_is_exact_causal_attention(qkv):
    q, k, v = qkv
    seed = jnp.asarray(7, jnp.uint32)
    out = flash_causal_attention_dropout(q, k, v, seed, 0.0, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref_attn(q, k, v)),
                               atol=1e-5)


def test_dropout_forward_matches_reference_with_same_mask(qkv):
    q, k, v = qkv
    rate = 0.1
    seed = jnp.asarray(123, jnp.uint32)
    mask = jnp.asarray(reference_probs_dropout_mask(123, B, H, S, rate))
    drop_frac = float((np.asarray(mask) == 0).mean())
    assert abs(drop_frac - rate) < 0.01, drop_frac
    out = flash_causal_attention_dropout(q, k, v, seed, rate, None, True)
    ref = _ref_attn(q, k, v, mask_scale=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dropout_gradients_match_reference_with_same_mask(qkv):
    q, k, v = qkv
    rate = 0.1
    seed = jnp.asarray(123, jnp.uint32)
    mask = jnp.asarray(reference_probs_dropout_mask(123, B, H, S, rate))

    def loss_k(q, k, v):
        return (flash_causal_attention_dropout(
            q, k, v, seed, rate, None, True) ** 2).sum()

    def loss_r(q, k, v):
        return (_ref_attn(q, k, v, mask_scale=mask) ** 2).sum()

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, "qkv"):
        scale = float(jnp.abs(b).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5 * max(scale, 1.0),
                                   err_msg=f"grad {name}")


def test_deterministic_same_seed_same_output(qkv):
    q, k, v = qkv
    seed = jnp.asarray(5, jnp.uint32)
    o1 = flash_causal_attention_dropout(q, k, v, seed, 0.1, None, True)
    o2 = flash_causal_attention_dropout(q, k, v, seed, 0.1, None, True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = flash_causal_attention_dropout(q, k, v, seed + 1, 0.1, None, True)
    assert float(jnp.abs(o3 - o1).max()) > 0.0
