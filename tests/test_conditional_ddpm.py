"""Class-conditional DDPM + classifier-free guidance (beyond parity —
the reference DDPM at src/models/ddpm.py:294-521 is unconditional).

Covers: the CFG algebra (guidance interpolates between the null-token and
conditional scores; the doubled-batch forward equals two separate ones),
label dropout wiring, param-tree backward compatibility (num_classes=0
keeps the exact unconditional tree), and a conditional train step.
Tree checks use jax.eval_shape (no compile); the train/sample e2e pieces
are slow-tier (UNet compiles dominate on the 1-core CPU host).
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

DM = to_node({"width": 8, "height": 8, "channels": 1,
              "transforms": {"convert": True, "normalize": True}})


def _model(**kw):
    kw.setdefault("hidden_dim", 8)
    kw.setdefault("timesteps", 8)
    kw.setdefault("dim_mults", (1, 2))
    kw.setdefault("compute_dtype", "float32")
    m = DDPM(datamodule=DM, **kw)
    m.steps_per_epoch = 10
    return m


@pytest.fixture(scope="module")
def cond_ms():
    m = _model(num_classes=4, cond_drop_prob=0.1, lr=1e-2, sample_batch=8,
               guidance_scale=2.0)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    return m, state


def test_unconditional_tree_has_no_class_emb():
    m = _model(num_classes=0)
    shapes = jax.eval_shape(m.init_state, jax.random.PRNGKey(0))
    assert "class_emb" not in shapes.params["denoise"]


def test_conditional_tree_has_null_token_row():
    m = _model(num_classes=10)
    shapes = jax.eval_shape(m.init_state, jax.random.PRNGKey(0))
    emb = shapes.params["denoise"]["class_emb"]["embedding"]
    assert emb.shape == (11, 8)  # num_classes + 1 rows (null token last)


def test_guidance_algebra(cond_ms):
    """eps(s) == eps_null + s * (eps_y - eps_null) for every s, and the
    doubled-batch CFG forward equals two separate forwards."""
    m, state = cond_ms
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (6, 8, 8, 1))
    t = jnp.full((6,), 3.0)
    y = jnp.array([0, 1, 2, 3, 0, 1], jnp.int32)
    null = jnp.full((6,), 4, jnp.int32)

    eps_y = m._denoise(state, x, t, y)
    eps_null = m._denoise(state, x, t, null)
    for s in (0.0, 0.5, 2.0, 3.0):
        got = m._eps(state, x, t, y, guidance=s)
        want = eps_null + s * (eps_y - eps_null)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
    # s=1 short-circuits to the single conditional forward
    np.testing.assert_allclose(np.asarray(m._eps(state, x, t, y, 1.0)),
                               np.asarray(eps_y), rtol=0, atol=0)
    # y=None uses the trained null token (unconditional generation)
    np.testing.assert_allclose(np.asarray(m._eps(state, x, t, None, 2.0)),
                               np.asarray(eps_null), rtol=0, atol=0)


@pytest.mark.slow
def test_conditional_train_step_and_sampling(cond_ms):
    m, state = cond_ms
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (8, 8, 8, 1))
    labels = jnp.arange(8) % 4
    state2, metrics = jax.jit(m.train_step)(state, (imgs, labels))
    assert np.isfinite(float(metrics["train_loss/loss"]))
    # conditional grid sampling (guided, doubled-batch path) + explicit y
    out = jax.jit(lambda s, r: m.sample(s, r, 8))(state2, jax.random.PRNGKey(3))
    assert out.shape == (8, 8, 8, 1) and np.isfinite(np.asarray(out)).all()
    out2 = m.ddim_sample(state2, jax.random.PRNGKey(4), 4, steps=3,
                         y=jnp.array([1, 2, 3, 0]), guidance=1.5)
    assert out2.shape == (4, 8, 8, 1) and np.isfinite(np.asarray(out2)).all()


@pytest.mark.slow
def test_label_dropout_reaches_null_row_gradient(cond_ms):
    """With cond_drop_prob=1 every label trains the null row; with 0 the
    null row's gradient is exactly zero.  Both arms reuse the fixture's
    state — cond_drop_prob only changes the traced step, not the params."""
    _, state = cond_ms

    def null_row_moved(p):
        m = _model(num_classes=4, cond_drop_prob=p, lr=1e-2)
        # optimizers must exist before train_step; build them without a
        # (slow) second init by reusing the fixture's param tree
        from igm_tpu.core.optim import OptimizerSet, adam
        hp = m.hparams
        m.optimizers = OptimizerSet().add(
            "opt", adam(hp.lr, hp.b1, hp.b2), ["denoise"])
        imgs = jax.random.uniform(jax.random.PRNGKey(5), (4, 8, 8, 1))
        labels = jnp.array([0, 1, 2, 0])
        before = np.asarray(
            state.params["denoise"]["class_emb"]["embedding"][4])
        state2, _ = jax.jit(m.train_step)(state, (imgs, labels))
        after = np.asarray(
            state2.params["denoise"]["class_emb"]["embedding"][4])
        return float(np.abs(after - before).max())

    assert null_row_moved(1.0) > 0.0
    assert null_row_moved(0.0) == 0.0
