"""Progressive distillation (models/distill.py) — beyond parity.

Anchors: the phase time ladder, the eq.-9 target's defining property
(one student DDIM step from the target must land exactly on the teacher's
two-step composition), frozen-teacher/student-init state plumbing, the
orbax teacher-checkpoint splice, and a loss-drop gate.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from igm_tpu.config import to_node
from igm_tpu.models.distill import ProgressiveDistillation
from igm_tpu.ops import diffusion as gd


def _model(**kw):
    dm = to_node({"width": 8, "height": 8, "channels": 1,
                  "transforms": {"convert": True, "normalize": True}})
    kw.setdefault("hidden_dim", 8)
    kw.setdefault("dim_mults", [1, 2])
    kw.setdefault("timesteps", 64)
    kw.setdefault("student_steps", 4)
    kw.setdefault("ema_decay", 0.0)
    m = ProgressiveDistillation(datamodule=dm, compute_dtype="float32", **kw)
    m.steps_per_epoch = 10
    return m


def test_phase_grid_ladder():
    m = _model(timesteps=64, student_steps=4)
    g = m._phase_grid()
    assert g.shape == (9,)
    assert g[0] == 0 and g[-1] == 63
    assert (np.diff(g) > 0).all()
    # even entries are the student's own N+1-point ladder
    np.testing.assert_array_equal(
        g[::2], np.linspace(0, 63, 5).round().astype(np.int32))


def test_constructor_guards():
    with pytest.raises(ValueError, match="student_steps"):
        _model(timesteps=8, student_steps=5)  # 2N > T
    with pytest.raises(ValueError, match="unconditional"):
        _model(num_classes=10)


def test_teacher_is_frozen_student_copy_at_init():
    m = _model()
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    assert "teacher" in state.opt_states
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_states["teacher"]),
                    jax.tree_util.tree_leaves(state.params["denoise"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_target_property_one_step_reproduces_two():
    """The eq.-9 target is DEFINED so that one deterministic DDIM step
    t -> t'' using x0 = x~ lands exactly on the teacher's two-step
    composition z'': alpha'' x~ + sigma'' eps~ == z'' with
    eps~ = (x_t - alpha_t x~)/sigma_t.  Checked against the model's own
    _distill_target with a nonlinear fake teacher."""
    m = _model(timesteps=64, student_steps=4)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))

    def fake_eps(st, x, t):  # nonlinear, time-dependent
        return 0.3 * x + 0.1 * jnp.tanh(x) * (1.0 + t.reshape(
            -1, 1, 1, 1).astype(jnp.float32) / 64.0)
    m._teacher_eps = fake_eps

    g = m._phase_grid()
    rng = jax.random.PRNGKey(1)
    x_t = jax.random.normal(rng, (8, 8, 8, 1))
    for i in (1, 2, 4):
        t = jnp.full((8,), int(g[2 * i]), jnp.int32)
        tm = jnp.full((8,), int(g[2 * i - 1]), jnp.int32)
        tp = jnp.full((8,), int(g[2 * i - 2]), jnp.int32)
        z1 = m._ddim_det(m.tables, x_t, fake_eps(state, x_t, t), t, tm)
        z2 = m._ddim_det(m.tables, z1, fake_eps(state, z1, tm), tm, tp)
        x0 = m._distill_target(state, x_t, t, tm, tp)
        a_t = gd.extract(m.tables.alphas_cumprod, t, 4)
        a_p = gd.extract(m.tables.alphas_cumprod, tp, 4)
        eps_t = (x_t - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t)
        one_step = jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * eps_t
        np.testing.assert_allclose(np.asarray(one_step), np.asarray(z2),
                                   rtol=1e-4, atol=1e-5)


def test_train_step_loss_drops_and_teacher_untouched():
    """Student starts AT the teacher, so the loss starts near its floor
    (the 1-vs-2-step discretisation gap) and the drop is modest + noisy
    (random per-step times/noise) — gate on window means, not endpoints
    (measured: first10 0.0385 -> last20 0.0311 at 300 steps, lr 2e-3)."""
    m = _model(lr=2e-3)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    teacher0 = jax.device_get(state.opt_states["teacher"])
    step = jax.jit(m.train_step)
    imgs = jax.random.normal(jax.random.PRNGKey(7), (16, 8, 8, 1)) * 0.1
    batch = ((imgs + 1.0) * 127.5, jnp.zeros((16,), jnp.int32))
    losses = []
    for _ in range(300):
        state, metrics = step(state, batch)
        v = float(metrics["train_loss/loss"])
        assert np.isfinite(v)
        losses.append(v)
    assert np.mean(losses[-20:]) < 0.9 * np.mean(losses[:10]), (
        np.mean(losses[:10]), np.mean(losses[-20:]))
    # the frozen teacher never moves; the student does
    for a, b in zip(jax.tree_util.tree_leaves(teacher0),
                    jax.tree_util.tree_leaves(
                        jax.device_get(state.opt_states["teacher"]))):
        np.testing.assert_array_equal(a, b)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(teacher0),
                        jax.tree_util.tree_leaves(state.params["denoise"])))
    assert moved


def test_student_sample_on_trained_grid():
    m = _model(timesteps=64, student_steps=4)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    out = np.asarray(jax.jit(
        lambda r: m.sample(state, r, 2))(jax.random.PRNGKey(3)))
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(out).all()
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_teacher_ckpt_splice(tmp_path):
    """init_state with teacher_ckpt: student params == teacher params
    (paper init), teacher EMA preferred when present, shape mismatch
    raises."""
    from igm_tpu.core.checkpoint import CheckpointManager
    from igm_tpu.models.ddpm import DDPM

    dm = to_node({"width": 8, "height": 8, "channels": 1,
                  "transforms": {"convert": True, "normalize": True}})
    teacher = DDPM(datamodule=dm, hidden_dim=8, dim_mults=[1, 2],
                   timesteps=64, compute_dtype="float32", ema_decay=0.999,
                   parameterization="eps")
    teacher.steps_per_epoch = 10
    tstate = jax.jit(teacher.init_state)(jax.random.PRNGKey(5))
    # make EMA distinguishable from live params
    ema = jax.tree_util.tree_map(lambda p: p + 1.0,
                                 tstate.params["denoise"])
    tstate = tstate.replace(opt_states={**tstate.opt_states, "ema": ema})
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, tstate)
    mgr.close()

    m = _model(timesteps=64, student_steps=4,
               teacher_ckpt=str(tmp_path / "ckpt"),
               parameterization="eps")
    # init_state does checkpoint IO -> not jittable here
    state = m.init_state(jax.random.PRNGKey(0))
    for a, b in zip(jax.tree_util.tree_leaves(state.params["denoise"]),
                    jax.tree_util.tree_leaves(ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_states["teacher"]),
                    jax.tree_util.tree_leaves(ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    wrong = _model(timesteps=64, student_steps=4, hidden_dim=16,
                   teacher_ckpt=str(tmp_path / "ckpt"),
                   parameterization="eps")
    with pytest.raises(ValueError, match="shape mismatch"):
        wrong.init_state(jax.random.PRNGKey(0))
