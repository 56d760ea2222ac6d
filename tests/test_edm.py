"""EDM (Karras et al. 2022) — sigma-space diffusion, beyond parity (the
reference's only diffusion model is the discrete-time DDPM,
src/models/ddpm.py).

Covers: preconditioning algebra (the c_* identities the loss weighting
relies on), the Karras grid, Heun-sampler exactness on a constant-x0
oracle (pins the whole sigma/ODE wiring including the first-order final
step), train-step finiteness + loss drop, conditional/CFG tracing, and
the config compositions.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.config import to_node
from igm_tpu.models.edm import (EDM, _c_in, _c_out, _c_skip, karras_sigmas)

DM = to_node({"width": 8, "height": 8, "channels": 1,
              "transforms": {"convert": True, "normalize": True}})


def _model(**kw):
    kw.setdefault("hidden_dim", 8)
    kw.setdefault("dim_mults", (1, 2))
    kw.setdefault("compute_dtype", "float32")
    kw.setdefault("sample_steps", 5)
    kw.setdefault("ema_decay", 0.0)
    m = EDM(datamodule=DM, **kw)
    m.steps_per_epoch = 10
    return m


def test_preconditioning_identities():
    """c_skip^2 + c_out^2/sd^2 * sigma^2-free identity checks:
    c_in^2 * (sigma^2 + sd^2) == 1 (unit-variance network input),
    c_out^2 * lambda == 1 (unit-variance F-space target), and
    sigma -> 0 collapses D to the identity (c_skip -> 1, c_out -> 0)."""
    sd = 0.5
    for s in (1e-4, 0.02, 0.5, 3.0, 80.0):
        s = jnp.asarray(s)
        assert abs(float(_c_in(s, sd)) ** 2 * (float(s) ** 2 + sd ** 2)
                   - 1.0) < 1e-6
        lam = (float(s) ** 2 + sd ** 2) / (float(s) * sd) ** 2
        assert abs(float(_c_out(s, sd)) ** 2 * lam - 1.0) < 1e-5
    assert float(_c_skip(jnp.asarray(1e-6), sd)) > 0.999999
    assert float(_c_out(jnp.asarray(1e-6), sd)) < 1e-5


def test_karras_grid():
    g = karras_sigmas(18, 0.002, 80.0, 7.0)
    assert g.shape == (19,)
    assert abs(g[0] - 80.0) < 1e-3 and abs(g[-2] - 0.002) < 1e-6
    assert g[-1] == 0.0
    assert (np.diff(g) < 0).all()  # strictly descending


def test_heun_oracle_lands_exactly():
    """With D(x; sigma) == c (constant image), the probability-flow ODE is
    linear (x(sigma) = c + A*sigma) and BOTH the Heun steps and the final
    first-order step integrate it exactly -> the sampler returns c."""
    m = _model()
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    c = 0.41

    def oracle_D(state, x, sigma, y=None, guidance=1.0):
        return jnp.full_like(x, c)

    orig = m._D
    m._D = oracle_D
    try:
        for steps in (2, 5, 18):
            out = m.heun_sample(state, jax.random.PRNGKey(1), 4, steps=steps)
            np.testing.assert_allclose(np.asarray(out), c, atol=1e-4)
    finally:
        m._D = orig


def test_train_step_and_loss_drop():
    m = _model(lr=3e-3)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    step = jax.jit(m.train_step)
    imgs = jax.random.normal(jax.random.PRNGKey(7), (16, 8, 8, 1)) * 0.1
    batch = ((imgs + 1.0) * 127.5, jnp.zeros((16,), jnp.int32))
    first = last = None
    for _ in range(40):
        state, metrics = step(state, batch)
        v = float(metrics["train_loss/loss"])
        assert np.isfinite(v)
        first = v if first is None else first
        last = v
    assert last < first * 0.9, (first, last)


def test_sample_shape_and_finite():
    m = _model()
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    out = m.sample(state, jax.random.PRNGKey(2), 2)
    assert out.shape == (2, 8, 8, 1)
    o = np.asarray(out)
    assert np.isfinite(o).all() and (o >= -1).all() and (o <= 1).all()


def test_conditional_cfg_traces():
    m = _model(num_classes=4, guidance_scale=2.0)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    batch = (jnp.full((8, 8, 8, 1), 128.0),
             jnp.arange(8, dtype=jnp.int32) % 4)
    state, metrics = jax.jit(m.train_step)(state, batch)
    assert np.isfinite(float(metrics["train_loss/loss"]))
    out = m.sample(state, jax.random.PRNGKey(1), 4)  # CFG doubled batch
    assert out.shape == (4, 8, 8, 1)


def test_ema_carried_and_used():
    m = _model(ema_decay=0.9)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    assert "ema" in state.opt_states
    batch = (jnp.full((8, 8, 8, 1), 128.0), jnp.zeros((8,), jnp.int32))
    s2, _ = jax.jit(m.train_step)(state, batch)
    # ema moved toward the updated params but is not equal to them
    p = jax.tree_util.tree_leaves(s2.params["denoise"])[0]
    e = jax.tree_util.tree_leaves(s2.opt_states["ema"])[0]
    assert not np.array_equal(np.asarray(p), np.asarray(e))


def test_config_composes_and_instantiates():
    from igm_tpu.config import compose
    from igm_tpu.config.instantiate import instantiate
    cfg = compose(Path(__file__).resolve().parent.parent / "configs",
                  ["experiment=edm/mnist", "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    assert type(model).__name__ == "EDM"
