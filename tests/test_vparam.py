"""v-parameterization + Min-SNR-gamma loss weighting (beyond parity —
the reference trains eps-prediction with the unweighted loss only,
src/models/ddpm.py:352-372).

Covers: the exact v<->eps conversion identity, min-SNR weight algebra,
an end-to-end v-prediction train step + sampler pass, and that the
default knobs (eps, gamma=0) reproduce the unweighted loss bit-exactly.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.config import to_node
from igm_tpu.models.ddpm import DDPM
from igm_tpu.ops import diffusion as gd

DM = to_node({"width": 8, "height": 8, "channels": 1,
              "transforms": {"convert": True, "normalize": True}})


def _model(**kw):
    kw.setdefault("hidden_dim", 8)
    kw.setdefault("dim_mults", (1, 2))
    kw.setdefault("compute_dtype", "float32")
    kw.setdefault("timesteps", 64)
    kw.setdefault("loss_type", "l2")
    m = DDPM(datamodule=DM, **kw)
    m.steps_per_epoch = 10
    return m


def test_v_eps_roundtrip_exact():
    """eps_from_v(x_t, v_target(x0, eps)) == eps for every t (the algebra
    the sampler choke-point conversion relies on)."""
    tables = gd.make_tables(64, "cosine")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(8, 8, 8, 1)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(8, 8, 8, 1)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 64, (8,)), jnp.int32)
    x_t = gd.q_sample(tables, x0, t, eps)
    v = gd.v_target(tables, x0, t, eps)
    back = gd.eps_from_v(tables, x_t, t, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(eps), atol=1e-5)


def test_min_snr_weight_algebra():
    tables = gd.make_tables(64, "cosine")
    t = jnp.arange(64)
    s = np.asarray(gd.snr(tables, t, 1))
    # gamma <= 0 disables: broadcastable ones
    w0 = gd.loss_weight(tables, t, 1, "eps", 0.0)
    assert w0.shape == (1,) and float(w0[0]) == 1.0
    # eps weight = min(snr, gamma)/snr in [0, 1], ==1 wherever snr <= gamma
    w = np.asarray(gd.loss_weight(tables, t, 1, "eps", 5.0))
    np.testing.assert_allclose(w, np.minimum(s, 5.0) / s, rtol=1e-6)
    assert (w <= 1.0 + 1e-6).all()
    # v weight = min(snr, gamma)/(snr+1)
    wv = np.asarray(gd.loss_weight(tables, t, 1, "v", 5.0))
    np.testing.assert_allclose(wv, np.minimum(s, 5.0) / (s + 1.0), rtol=1e-6)


def test_v_prediction_trains_and_samples():
    m = _model(parameterization="v", snr_gamma=5.0)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = (rng.integers(0, 255, (8, 8, 8, 1), dtype=np.uint8),
             np.zeros((8,), np.int32))
    state, metrics = jax.jit(m.train_step)(state, batch)
    assert np.isfinite(float(metrics["train_loss/loss"]))
    # all three samplers consume the converted eps without code changes
    out = m.ddim_sample(state, jax.random.PRNGKey(1), 2, steps=4)
    assert out.shape == (2, 8, 8, 1) and np.isfinite(np.asarray(out)).all()
    out = m.dpm_sample(state, jax.random.PRNGKey(1), 2, steps=4)
    assert np.isfinite(np.asarray(out)).all()


def test_default_knobs_reproduce_unweighted_eps_loss():
    """parameterization=eps + snr_gamma=0 must give the SAME loss as the
    pre-knob code path (same RNG stream, same math — resume-compatible)."""
    m1 = _model()
    m2 = _model(parameterization="eps", snr_gamma=0.0)
    s1 = jax.jit(m1.init_state)(jax.random.PRNGKey(0))
    s2 = jax.jit(m2.init_state)(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batch = (rng.integers(0, 255, (8, 8, 8, 1), dtype=np.uint8),
             np.zeros((8,), np.int32))
    _, met1 = jax.jit(m1.train_step)(s1, batch)
    _, met2 = jax.jit(m2.train_step)(s2, batch)
    assert float(met1["train_loss/loss"]) == float(met2["train_loss/loss"])


def test_invalid_parameterization_raises():
    with pytest.raises(ValueError):
        _model(parameterization="x0")
