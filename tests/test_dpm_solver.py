"""DPM-Solver++(2M) fast sampler (beyond parity — the reference has only
the 1000-step ancestral loop, src/models/ddpm.py:399-409).

Covers: exact algebra on a constant-x0 oracle (the solver must land on the
data point exactly — this pins the alpha/sigma/lambda wiring and the final
sigma->0 limit), agreement with DDIM(eta=0) on a fine grid (both integrate
the same probability-flow ODE), val_sampler="dpm" dispatch, and the latent
model's decode-wrapped override.
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
    kw.setdefault("dim_mults", (1, 2))
    kw.setdefault("compute_dtype", "float32")
    kw.setdefault("timesteps", 64)
    m = DDPM(datamodule=DM, **kw)
    m.steps_per_epoch = 10
    return m


@pytest.fixture(scope="module")
def ms():
    m = _model()
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    return m, state


def test_constant_x0_oracle_exact(ms):
    """With an eps-oracle whose implied x0 is a constant image c, the
    multistep update telescopes and the final sigma->0 step returns c
    EXACTLY, for any step count."""
    m, state = ms
    c = 0.37
    acp = m.tables.alphas_cumprod

    def oracle_eps(state, x, t, y=None, guidance=1.0):
        a = acp[t.astype(jnp.int32)].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(a) * c) / jnp.sqrt(1.0 - a)

    orig = m._eps
    m._eps = oracle_eps
    try:
        for steps in (2, 5, 20):
            out = m.dpm_sample(state, jax.random.PRNGKey(3), 4, steps=steps)
            np.testing.assert_allclose(np.asarray(out), c, rtol=0,
                                       atol=1e-5)
    finally:
        m._eps = orig


def test_gaussian_oracle_closed_form(ms):
    """For N(mu, s^2 I) data the probability-flow ODE preserves the
    standardized quantile z = (x_t - alpha_t mu)/sqrt(alpha_t^2 s^2 +
    sigma_t^2), so the exact endpoint is mu + s z.  Both ODE samplers must
    converge to it, and DPM-Solver++ must be markedly more accurate than
    DDIM in the few-step regime (its reason to exist).

    (An untrained random net is NOT a valid oracle here — its flow is
    chaotic and DDIM does not even grid-converge against itself.)"""
    m, state = ms
    acp = m.tables.alphas_cumprod
    mu, s = 0.1, 0.3

    def oracle(state, x, t, y=None, guidance=1.0):
        a = acp[t.astype(jnp.int32)].reshape(-1, 1, 1, 1)
        return jnp.sqrt(1 - a) * (x - jnp.sqrt(a) * mu) / (a * s * s + (1 - a))

    orig = m._eps
    m._eps = oracle
    try:
        rng = jax.random.PRNGKey(11)
        x_init = jax.random.normal(jax.random.split(rng)[0], (2, 8, 8, 1))
        a_t = acp[m.timesteps - 1]
        z = (np.asarray(x_init) - np.sqrt(a_t) * mu) / np.sqrt(
            a_t * s * s + (1 - a_t))
        exact = mu + s * z

        def err(x):
            return float(np.max(np.abs(np.asarray(x) - exact)))

        e_dpm5 = err(m.dpm_sample(state, rng, 2, steps=5))
        e_ddim5 = err(m.ddim_sample(state, rng, 2, steps=5))
        e_dpm32 = err(m.dpm_sample(state, rng, 2, steps=32))
        # few-step regime: second-order multistep beats first-order DDIM
        assert e_dpm5 < 0.6 * e_ddim5, (e_dpm5, e_ddim5)
        # and it converges to the true endpoint on a finer grid
        assert e_dpm32 < 0.1, e_dpm32
        assert e_dpm32 < e_dpm5, (e_dpm32, e_dpm5)
    finally:
        m._eps = orig


def test_val_sampler_dispatch():
    m = _model(val_sampler="dpm", dpm_steps=4, sample_batch=2)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    batch = (jnp.full((4, 8, 8, 1), 128.0), jnp.zeros((4,), jnp.int32))
    result, _ = m.validation_step(state, batch, jax.random.PRNGKey(1),
                                  sample=True)
    fake = result["fake_image"]
    assert fake.shape == (2, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(fake)))


def test_conditional_guided_dpm(ms):
    m = _model(num_classes=4, guidance_scale=2.0)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    out = m.dpm_sample(state, jax.random.PRNGKey(5), 4, steps=4,
                       y=jnp.array([0, 1, 2, 3], jnp.int32), guidance=2.0)
    assert out.shape == (4, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_alt_timestep_schedule_properties(ms):
    """logsnr/karras spacings: strictly increasing, start at t=0, and
    allocate the step budget by noise level, not uniformly in t.  karras
    clamps sigma_max to 80 so its top t sits BELOW the table end (the
    cosine table's own sigma_max is ~1300); logsnr spans the full table."""
    m, _ = ms
    acp = np.asarray(m.tables.alphas_cumprod)
    sig = np.sqrt((1 - acp) / acp)
    t_log = m._dpm_timesteps(12, "logsnr")
    assert t_log[0] == 0 and t_log[-1] == m.timesteps - 1
    assert (np.diff(t_log) > 0).all()
    t_kar = m._dpm_timesteps(12, "karras")
    assert t_kar[0] == 0 and (np.diff(t_kar) > 0).all()
    assert sig[t_kar[-1]] <= 80.0 * 1.5  # clamped top sigma
    # karras places >= half the budget below sigma=2 (low-noise density)
    assert (sig[t_kar] < 2.0).sum() >= len(t_kar) // 2


def test_alt_schedules_oracle_exact(ms):
    """The constant-x0 oracle telescopes exactly under ANY spacing — this
    pins the solver algebra independently of schedule choice.  (karras
    starts below the table end; since the oracle is exact everywhere the
    endpoint is still hit exactly.)"""
    m, state = ms
    acp = m.tables.alphas_cumprod
    c = 0.37

    def oracle_c(state, x, t, y=None, guidance=1.0):
        a = acp[t.astype(jnp.int32)].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(a) * c) / jnp.sqrt(1.0 - a)

    orig = m._eps
    m._eps = oracle_c
    try:
        for schedule in ("logsnr", "karras"):
            out = m.dpm_sample(state, jax.random.PRNGKey(3), 2, steps=6,
                               schedule=schedule)
            np.testing.assert_allclose(np.asarray(out), c, rtol=0, atol=1e-5,
                                       err_msg=schedule)
    finally:
        m._eps = orig


def test_dpm_schedule_hparam_dispatch():
    m = _model(dpm_schedule="karras")
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    out = m.dpm_sample(state, jax.random.PRNGKey(7), 2, steps=5)
    assert out.shape == (2, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        m._dpm_timesteps(5, "banana")
