"""Flow matching / rectified flow (beyond parity — the reference zoo,
SURVEY.md §2, has no continuous-time flow family).

Covers: the interpolation-path/target algebra (exact against numpy), the
Heun sampler's agreement with a fine Euler grid on a linear velocity
field, CFG algebra on the velocity head, and a train-step + ODE-sample
e2e (slow tier; UNet compiles dominate on the 1-core CPU host).
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.config import to_node
from igm_tpu.models.flow_matching import FlowMatching

DM = to_node({"width": 8, "height": 8, "channels": 1,
              "transforms": {"convert": True, "normalize": True}})


def _model(**kw):
    kw.setdefault("hidden_dim", 8)
    kw.setdefault("dim_mults", (1, 2))
    kw.setdefault("compute_dtype", "float32")
    kw.setdefault("sample_steps", 4)
    m = FlowMatching(datamodule=DM, **kw)
    m.steps_per_epoch = 10
    return m


@pytest.fixture(scope="module")
def cond_ms():
    m = _model(num_classes=4, sampler="euler", lr=1e-2, sample_batch=8)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    return m, state


def test_path_and_target_algebra():
    """x_t and v* match the CFM definitions exactly (pure numpy mirror)."""
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(5, 8, 8, 1)).astype(np.float32)
    x1 = rng.normal(size=(5, 8, 8, 1)).astype(np.float32)
    t = rng.uniform(size=(5,)).astype(np.float32)
    for sm in (0.0, 0.01):
        tb = t.reshape(-1, 1, 1, 1)
        x_t = (1.0 - (1.0 - sm) * tb) * x0 + tb * x1
        v = x1 - (1.0 - sm) * x0
        # at t=0 the path starts at x0; at t=1 it ends at x1 + sm*x0
        np.testing.assert_allclose(x_t - tb * v, x0, rtol=1e-5, atol=1e-6)
        # the velocity target is the time-derivative of the path
        eps = 1e-3
        x_t2 = (1.0 - (1.0 - sm) * (tb + eps)) * x0 + (tb + eps) * x1
        np.testing.assert_allclose((x_t2 - x_t) / eps, v, rtol=1e-3,
                                   atol=1e-3)


def test_sampler_integrates_linear_field(monkeypatch):
    """On dx/dt = a*x + b (closed form known), Heun at 8 steps lands within
    O(dt^2) of the exact solution while Euler is only O(dt)."""
    a, b = -0.7, 0.3

    def run(sampler, steps):
        m = _model(sampler=sampler, sample_steps=steps)
        monkeypatch.setattr(
            m, "_velocity",
            lambda state, x, t, y=None, guidance=1.0: a * x + b)
        x = m.ode_sample(state=None, rng=jax.random.PRNGKey(7), n=16,
                         steps=steps)
        return np.asarray(x)

    x0 = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (16, 8, 8, 1)))
    exact = (x0 + b / a) * np.exp(a) - b / a
    err_heun = np.abs(run("heun", 8) - exact).max()
    err_euler = np.abs(run("euler", 8) - exact).max()
    assert err_heun < 0.01
    assert err_heun < err_euler / 5


def test_unconditional_tree_has_no_class_emb():
    m = _model(num_classes=0)
    shapes = jax.eval_shape(m.init_state, jax.random.PRNGKey(0))
    assert "class_emb" not in shapes.params["velocity"]


def test_cfg_algebra(cond_ms):
    m, state = cond_ms
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 8, 8, 1))
    y = jnp.array([0, 1, 2, 3, 0, 1], jnp.int32)
    null = jnp.full((6,), 4, jnp.int32)
    v_y = m._velocity(state, x, 0.5, y)
    v_null = m._velocity(state, x, 0.5, null)
    for s in (0.0, 0.5, 2.0):
        got = m._velocity(state, x, 0.5, y, guidance=s)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(v_null + s * (v_y - v_null)),
                                   rtol=2e-5, atol=2e-5)
    # y=None resolves to the null token
    np.testing.assert_allclose(np.asarray(m._velocity(state, x, 0.5, None)),
                               np.asarray(v_null), rtol=0, atol=0)


@pytest.mark.slow
def test_train_step_and_ode_sampling(cond_ms):
    m, state = cond_ms
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (8, 8, 8, 1))
    labels = jnp.arange(8) % 4
    state2, metrics = jax.jit(m.train_step)(state, (imgs, labels))
    assert np.isfinite(float(metrics["train_loss/loss"]))
    out = jax.jit(lambda s, r: m.sample(s, r, 8))(state2,
                                                  jax.random.PRNGKey(3))
    assert out.shape == (8, 8, 8, 1) and np.isfinite(np.asarray(out)).all()
    res, _ = m.validation_step(state2, (imgs, labels), jax.random.PRNGKey(4),
                               sample=True)
    assert res["fake_image"].shape == (8, 8, 8, 1)


@pytest.mark.slow
def test_flow_loss_decreases_on_fixed_batch():
    """100 steps on one tiny batch: the CFM loss must drop substantially
    (learning-signal gate, same convention as tests/test_convergence.py)."""
    m = _model(lr=3e-3, sampler="euler")
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (16, 8, 8, 1))
    labels = jnp.zeros((16,), jnp.int32)
    step = jax.jit(m.train_step)
    first = last = None
    for _ in range(100):
        state, metrics = step(state, (imgs, labels))
        v = float(metrics["train_loss/loss"])
        first = v if first is None else first
        last = v
    assert last < 0.5 * first, (first, last)
