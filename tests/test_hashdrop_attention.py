"""Hash-based fusible probs-dropout attention (ops/causal_attention.py).

Contract: ``hash_dropout_attention_fn`` is flax's stock attention with the
dropout mask replaced by an elementwise counter-hash of
(seed, batch, head, q, k) — so (1) the deterministic path must EXACTLY
equal flax's dot-product attention, and (2) the dropout path must equal a
reference that recomputes the same hash mask explicitly (exact math, not
statistics), with the empirical drop fraction matching the rate.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from igm_tpu.ops.causal_attention import hash_dropout_attention_fn  # noqa: E402
from igm_tpu.ops.pallas_dropout_attention import _hash_bits  # noqa: E402

B, S, H, D = 2, 37, 2, 16
RATE = 0.25


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(3)
    return tuple(jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
                 for _ in range(3))


def _causal_mask():
    return jnp.tril(jnp.ones((S, S), bool))[None, None]


def _stock(q, k, v, mask):
    from flax.linen.attention import dot_product_attention
    return dot_product_attention(q, k, v, mask=mask, deterministic=True)


def _hash_mask_scale(seed: int):
    """Recompute the fn's mask independently: keep/ (1-rate) scale array."""
    qi = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, S, S), 2)
    kj = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, S, S), 3)
    bh = (jax.lax.broadcasted_iota(jnp.uint32, (B, H, 1, 1), 0) * H
          + jax.lax.broadcasted_iota(jnp.uint32, (B, H, 1, 1), 1))
    bits = _hash_bits(jnp.uint32(seed) + bh, qi, kj)
    thresh = jnp.uint32(min(int(RATE * 2 ** 32), 2 ** 32 - 1))
    return jnp.where(bits >= thresh, 1.0 / (1.0 - RATE), 0.0)


def test_deterministic_equals_stock_attention(qkv):
    q, k, v = qkv
    mask = _causal_mask()
    out = hash_dropout_attention_fn(q, k, v, mask=mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_stock(q, k, v, mask)), atol=1e-6)


def test_dropout_matches_explicit_hash_mask(qkv):
    q, k, v = qkv
    mask = _causal_mask()
    rng = jax.random.PRNGKey(11)
    out = hash_dropout_attention_fn(
        q, k, v, mask=mask, dropout_rng=rng, dropout_rate=RATE,
        deterministic=False)
    seed = int(jax.random.bits(rng, dtype=jnp.uint32))
    scale = _hash_mask_scale(seed)
    drop_frac = float((np.asarray(scale) == 0).mean())
    assert abs(drop_frac - RATE) < 0.02, drop_frac
    from flax.linen.attention import dot_product_attention_weights
    probs = dot_product_attention_weights(q, k, mask=mask,
                                          deterministic=True)
    ref = jnp.einsum("...hqk,...khd->...qhd",
                     probs * scale.astype(probs.dtype), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_grads_flow_and_are_finite(qkv):
    q, k, v = qkv
    mask = _causal_mask()
    rng = jax.random.PRNGKey(2)

    def loss(q, k, v):
        o = hash_dropout_attention_fn(
            q, k, v, mask=mask, dropout_rng=rng, dropout_rate=RATE,
            deterministic=False)
        return (o ** 2).sum()

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g, name in zip((gq, gk, gv), "qkv"):
        assert np.isfinite(np.asarray(g)).all(), name
        assert float(jnp.abs(g).max()) > 0.0, name


def test_tar_knob_resolves_hashdrop_and_trains_off_tpu():
    """hashdrop is a pure-XLA path, so unlike the Pallas knobs it must
    survive (not be downgraded) on a non-TPU backend, and train."""
    from igm_tpu.models.tar import TAR
    dm = {"width": 4, "height": 4, "channels": 1,
          "transforms": {"normalize": False}, "n_classes": 10}
    model = TAR(dm, d_model=16, nhead=2, num_layers=1,
                flash_attention="hashdrop")
    assert model.modules["net"].flash == "hashdrop"
    model.steps_per_epoch = 4
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    batch = (jnp.zeros((2, 4, 4, 1), jnp.uint8), jnp.zeros((2,), jnp.int32))
    _, metrics = jax.jit(model.train_step)(state, batch)
    assert np.isfinite(float(metrics["train_log/nll"]))
