"""Consistency models (Song et al. 2023; iCT recipe) — beyond parity
(the reference's only sampler is DDPM's 1000-eval ancestral chain,
src/models/ddpm.py:68-101).

Covers: the boundary condition f(x, sigma_min) == x (exact, by the
anchored c_skip/c_out), lognormal index weights (sum to 1, peaked at
the lognormal's mode), train-step finiteness + loss drop, 1-step vs
multistep sampling shapes, conditional tracing, the stopgrad-teacher
property (teacher receives no gradient), and config composition.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.config import to_node
from igm_tpu.models.consistency import (ConsistencyModel,
                                        lognormal_index_weights)
from igm_tpu.models.edm import karras_sigmas

DM = to_node({"width": 8, "height": 8, "channels": 1,
              "transforms": {"convert": True, "normalize": True}})


def _model(**kw):
    kw.setdefault("hidden_dim", 8)
    kw.setdefault("dim_mults", (1, 2))
    kw.setdefault("compute_dtype", "float32")
    kw.setdefault("n_grid", 16)
    kw.setdefault("sample_steps", 2)
    kw.setdefault("ema_decay", 0.0)
    m = ConsistencyModel(datamodule=DM, **kw)
    m.steps_per_epoch = 10
    return m


def test_boundary_condition_exact():
    """f(x, sigma_min) == x for ANY network output: c_skip(smin)=1,
    c_out(smin)=0 by construction."""
    m = _model()
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 1))
    smin = float(m.hparams.sigma_min)
    f, _ = m._f(state.params, state.mutables, x,
                jnp.full((4,), smin), None, train=False)
    np.testing.assert_allclose(np.asarray(f), np.asarray(x), atol=1e-6)


def test_lognormal_index_weights():
    grid = karras_sigmas(64, 0.002, 80.0, 7.0)[:-1][::-1]
    w = lognormal_index_weights(grid, -1.1, 2.0)
    assert w.shape == (63,)
    assert abs(w.sum() - 1.0) < 1e-5 and (w > 0).all()
    # peak near ln(sigma) = -1.1 -> sigma ~ 0.33
    peak_sigma = grid[int(np.argmax(w))]
    assert 0.05 < peak_sigma < 2.0, peak_sigma


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


def test_teacher_gets_no_gradient():
    """The stopgrad teacher: with the student branch ablated, the loss
    gradient w.r.t. params must be exactly zero."""
    m = _model()
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 1))
    s = jnp.full((4,), 1.0)

    def teacher_only(params):
        f, _ = m._f(jax.lax.stop_gradient(params), state.mutables, x, s,
                    None, train=False)
        return jnp.sum(jax.lax.stop_gradient(f) ** 2)

    g = jax.grad(teacher_only)(state.params)
    assert all(float(jnp.abs(l).max()) == 0.0
               for l in jax.tree_util.tree_leaves(g))


def test_sample_shapes_one_and_multistep():
    m = _model()
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    for steps in (1, 2, 4):
        out = m.multistep_sample(state, jax.random.PRNGKey(2), 3,
                                 steps=steps)
        assert out.shape == (3, 8, 8, 1)
        assert np.isfinite(np.asarray(out)).all()
    clipped = m.sample(state, jax.random.PRNGKey(3), 2)
    o = np.asarray(clipped)
    assert (o >= -1).all() and (o <= 1).all()


def test_conditional_traces():
    m = _model(num_classes=4)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    batch = (jnp.full((8, 8, 8, 1), 128.0),
             jnp.arange(8, dtype=jnp.int32) % 4)
    state, metrics = jax.jit(m.train_step)(state, batch)
    assert np.isfinite(float(metrics["train_loss/loss"]))
    out = m.sample(state, jax.random.PRNGKey(1), 4)
    assert out.shape == (4, 8, 8, 1)


def test_ema_used_for_sampling():
    m = _model(ema_decay=0.9)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    assert "ema" in state.opt_states
    batch = (jnp.full((8, 8, 8, 1), 128.0), jnp.zeros((8,), jnp.int32))
    s2, _ = jax.jit(m.train_step)(state, batch)
    p = jax.tree_util.tree_leaves(s2.params["denoise"])[0]
    e = jax.tree_util.tree_leaves(s2.opt_states["ema"])[0]
    assert not np.array_equal(np.asarray(p), np.asarray(e))


def test_config_composes_and_instantiates():
    from igm_tpu.config import compose
    from igm_tpu.config.instantiate import instantiate
    cfg = compose(Path(__file__).resolve().parent.parent / "configs",
                  ["experiment=consistency/mnist", "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    assert type(model).__name__ == "ConsistencyModel"
