"""Fused GroupNorm+Mish kernel: forward + VJP correctness (interpret mode)."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from igm_tpu.ops.pallas_groupnorm import (  # noqa: E402
    group_norm_mish, reference_group_norm_mish)


def _data(seed=0, n=2, h=8, w=8, c=32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    gamma = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1 + 1.0)
    beta = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    return x, gamma, beta


def test_forward_matches_reference():
    x, gamma, beta = _data()
    with pltpu.force_tpu_interpret_mode():
        got = group_norm_mish(x, gamma, beta, 8)
    want = reference_group_norm_mish(x, gamma, beta, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_vjp_matches_autodiff():
    x, gamma, beta = _data(1)

    def loss_fused(x, gamma, beta):
        return (group_norm_mish(x, gamma, beta, 8) ** 2).sum()

    def loss_ref(x, gamma, beta):
        return (reference_group_norm_mish(x, gamma, beta, 8) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
