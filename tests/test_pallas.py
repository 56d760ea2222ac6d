"""Pallas kernel correctness (interpret mode on CPU) + VJP checks."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def test_pallas_vq_interpret():
    from igm_tpu.ops.pallas_vq import nearest_codebook_pallas
    from igm_tpu.ops.vq import nearest_codebook

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32))
    book = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = nearest_codebook_pallas(z, book, tile_m=128)
    want = nearest_codebook(z, book)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_linear_attention_interpret():
    from igm_tpu.ops.pallas_attention import linear_attention_pallas
    from igm_tpu.ops.attention import _xla_forward

    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 64, 4, 32)).astype(np.float32))
               for _ in range(3))
    with pltpu.force_tpu_interpret_mode():
        got = linear_attention_pallas(q, k, v)
    want = _xla_forward(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_linear_attention_custom_vjp_matches_autodiff():
    from igm_tpu.ops.attention import linear_attention, _xla_forward

    rng = np.random.default_rng(2)
    q, k, v = (jnp.asarray(rng.normal(size=(1, 16, 2, 8)).astype(np.float32))
               for _ in range(3))

    def loss_custom(q, k, v):
        return (linear_attention(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        return (_xla_forward(q, k, v) ** 2).sum()

    g_custom = jax.grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_custom, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
