"""Score-SDE (VE) family (models/score_sde.py) — beyond parity.

Anchors: the VE grid/schedule algebra, a loss-drop gate, and ORACLE-score
sampler checks — with the exact Gaussian score the PC chain must reproduce
the true marginal statistics and the probability-flow ODE must land on its
closed-form solution (pins the predictor/corrector/Tweedie wiring).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from igm_tpu.config import to_node
from igm_tpu.models.score_sde import ScoreSDE, ve_sigma_grid


def _model(**kw):
    dm = to_node({"width": 8, "height": 8, "channels": 1,
                  "transforms": {"convert": True, "normalize": True}})
    kw.setdefault("hidden_dim", 8)
    kw.setdefault("dim_mults", [1, 2])
    kw.setdefault("ema_decay", 0.0)
    m = ScoreSDE(datamodule=dm, compute_dtype="float32", **kw)
    m.steps_per_epoch = 10
    return m


def test_ve_grid():
    g = ve_sigma_grid(64, 0.01, 50.0)
    assert g.shape == (64,)
    np.testing.assert_allclose(g[0], 50.0, rtol=1e-5)
    np.testing.assert_allclose(g[-1], 0.01, rtol=1e-5)
    assert (np.diff(g) < 0).all()
    # geometric: constant ratio
    r = g[1:] / g[:-1]
    np.testing.assert_allclose(r, r[0], rtol=1e-4)


def test_sigma_of_t_endpoints():
    m = _model()
    np.testing.assert_allclose(float(m._sigma_of_t(jnp.array(0.0))), 0.01,
                               rtol=1e-6)
    np.testing.assert_allclose(float(m._sigma_of_t(jnp.array(1.0))), 50.0,
                               rtol=1e-5)


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
    assert last < first, (first, last)


def _oracle(m):
    """Exact score of the VE-perturbed standard normal: data ~ N(0, I)
    gives p_sigma = N(0, (1+sigma^2) I), score(x) = -x / (1+sigma^2)."""
    def score(state, x, sigma):
        sb = sigma.reshape(-1, *([1] * (x.ndim - 1)))
        return -x / (1.0 + sb ** 2)
    m.score = score


def test_pc_oracle_matches_true_marginal():
    """With the oracle score the PC chain's terminal (Tweedie-denoised)
    samples must match N(0, 1/(1+sigma_min^2)) ~= N(0, 1) statistics.

    Two-part assertion.  (a) EXACTNESS against the discrete chain's own
    law: with the Gaussian oracle, every predictor step is the linear map
    x' = x (1 - v/V) + sqrt(v) z (v = s^2 - s'^2, V = 1 + s^2), so the
    chain's variance obeys a closed recursion — the sampler's empirical
    variance must match it to sampling error (pins the predictor update
    and terminal Tweedie denoise EXACTLY, discretisation bias included).
    (b) sanity vs the continuous limit: the coarse 64-step chain lands
    within ~12% of the true N(0,1) marginal (the predictor's O(dsigma^2)
    variance inflation — the paper's remedy is more steps / correctors,
    tested in the anneal test below)."""
    from igm_tpu.models.score_sde import ve_sigma_grid

    def run(steps, corr, key=3):
        m = _model(sample_steps=steps, corrector_steps=corr)
        state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
        _oracle(m)
        out = np.asarray(jax.jit(
            lambda r: m.pc_sample(state, r, 512))(jax.random.PRNGKey(key)))
        assert out.shape == (512, 8, 8, 1)
        return out.reshape(-1)

    def predicted_var(steps):
        g = ve_sigma_grid(steps, 0.01, 50.0).astype(np.float64)
        var = g[0] ** 2  # init x = sigma_max * z
        for s_cur, s_next in zip(g[:-1], g[1:]):
            v = s_cur ** 2 - s_next ** 2
            big_v = 1.0 + s_cur ** 2
            var = var * (1.0 - v / big_v) ** 2 + v
        return var / (1.0 + g[-1] ** 2) ** 2  # terminal Tweedie contraction

    for steps in (64, 192):
        emp = run(steps, corr=0, key=steps)
        np.testing.assert_allclose(emp.var(), predicted_var(steps),
                                   rtol=0.03)
        assert abs(emp.mean()) < 0.02
    np.testing.assert_allclose(run(64, corr=1).var(), 1.0, rtol=0.12)


def test_pc_corrector_anneals_toward_stationary():
    """Langevin-only sanity: corrector steps at an (almost) FIXED sigma
    drive a badly-initialised chain toward p_sigma.  The init has
    var = sigma_max^2 = 1 but p_sigma has var 1+sigma^2 ~= 2; discrete
    Langevin converges to within its O(eps) stationary bias, so the
    corrector must close most of the var-gap vs the corrector-free run."""
    target = 1.0 + 0.99 ** 2  # pre-Tweedie marginal variance

    def run(corr):
        m = _model(sample_steps=2, corrector_steps=corr, snr=0.15,
                   sigma_max=1.0, sigma_min=0.99)
        state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
        _oracle(m)
        out = np.asarray(jax.jit(
            lambda r: m.pc_sample(state, r, 512))(jax.random.PRNGKey(4)))
        # undo the terminal Tweedie contraction x -> x/(1+sigma^2) to
        # compare against the pre-denoise marginal
        return out.reshape(-1).var() * (1 + 0.99 ** 2) ** 2

    gap_none = abs(run(0) - target)
    gap_corr = abs(run(60) - target)
    assert gap_corr < 0.35 * gap_none, (gap_none, gap_corr)
    np.testing.assert_allclose(run(60), target, rtol=0.1)


def test_ode_oracle_lands_on_closed_form():
    """Probability flow with the Gaussian oracle is the linear-in-scale map
    x(s) = x(s_max) sqrt((1+s^2)/(1+s_max^2)); after the terminal Tweedie
    denoise the sampler must land on x(s_min)/(1+s_min^2) exactly."""
    m = _model(sample_steps=256, sampler="ode")
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    _oracle(m)
    rng = jax.random.PRNGKey(5)
    out = np.asarray(jax.jit(lambda r: m.ode_sample(state, r, 16))(rng))
    x0 = np.asarray(jax.random.normal(rng, (16, 8, 8, 1))) * 50.0
    s_min = 0.01
    expect = (x0 * np.sqrt((1 + s_min ** 2) / (1 + 50.0 ** 2))
              / (1 + s_min ** 2))
    np.testing.assert_allclose(out, expect, rtol=2e-3, atol=2e-4)


def test_sample_clips_and_routes_sampler():
    m = _model(sample_steps=4, sampler="ode")
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    out = np.asarray(m.sample(state, jax.random.PRNGKey(1), 2))
    assert out.shape == (2, 8, 8, 1)
    assert out.min() >= -1.0 and out.max() <= 1.0
    with pytest.raises(ValueError, match="sampler"):
        _model(sampler="bogus")
    with pytest.raises(ValueError, match="sde"):
        _model(sde="bogus")


# --------------------------------------------------------------- VP / sub-VP

def test_vp_kernel_matches_ddpm_cumprod():
    """The VP SDE is the continuous-time limit of DDPM's discrete chain
    (paper App. B): with the standard linear ladder beta_i = beta(t_i)/N,
    DDPM's sqrt(alpha-bar_i) / sqrt(1 - alpha-bar_i) must converge to the
    kernel's m(t_i) / sigma(t_i).  N=1000 pins the coefficients to ~1e-3
    — the quantitative link between score_sde(sde=vp) and models/ddpm.py."""
    from igm_tpu.models.score_sde import vp_B

    m = _model(sde="vp", beta_min=0.1, beta_max=20.0)
    big_n = 1000
    t = (np.arange(1, big_n + 1)) / big_n
    beta_disc = m._beta(t) / big_n
    abar = np.cumprod(1.0 - beta_disc)
    mean_c, sigma = m._kernel(t)
    np.testing.assert_allclose(mean_c, np.sqrt(abar), atol=3e-3)
    np.testing.assert_allclose(sigma, np.sqrt(1.0 - abar), atol=3e-3)
    # closed form of the integral itself
    np.testing.assert_allclose(vp_B(np.array([1.0]), 0.1, 20.0),
                               [0.1 + 0.5 * 19.9], rtol=1e-12)


def test_subvp_coefficients():
    """sub-VP relations (paper eq. 28/32): sigma = 1 - exp(-B) (the
    SQUARE ROOT of VP's variance bound, always below it) and
    g^2 = beta (1 - exp(-2B))."""
    from igm_tpu.models.score_sde import vp_B

    m = _model(sde="subvp", beta_min=0.1, beta_max=20.0)
    t = np.linspace(0.05, 1.0, 7)
    B = vp_B(t, 0.1, 20.0)
    _, sig_sub = m._kernel(t)
    np.testing.assert_allclose(sig_sub, 1.0 - np.exp(-B), rtol=1e-6)
    np.testing.assert_allclose(m._g2(t),
                               m._beta(t) * (1.0 - np.exp(-2.0 * B)),
                               rtol=1e-6)
    m_vp = _model(sde="vp", beta_min=0.1, beta_max=20.0)
    _, sig_vp = m_vp._kernel(t)
    assert (sig_sub <= sig_vp + 1e-9).all()


def _oracle_scaled(m, v0: float):
    """Exact score for data ~ N(0, v0 I) under the scaled kernel
    x_t = m x_0 + sigma z: p_t = N(0, (m^2 v0 + sigma^2) I)."""
    def score(state, x, sigma, mc=1.0):
        sb = sigma.reshape(-1, *([1] * (x.ndim - 1)))
        return -x / (mc ** 2 * v0 + sb ** 2)
    m.score = score


def test_vp_pc_oracle_matches_chain_law():
    """With the Gaussian oracle every VP predictor step is the linear map
    x' = c x + sqrt(beta_d) z with c = 2 - sqrt(1-beta_d) - beta_d/V
    (V = m^2 v0 + sigma^2 at the current level), so the chain variance
    obeys a closed recursion; the sampler must match it to sampling error
    — pins the kernel-exact discrete beta, the predictor update, and the
    scaled terminal Tweedie denoise.  Sanity: the corrected chain lands
    near the true x_0 marginal N(0, v0)."""
    from igm_tpu.models.score_sde import vp_B

    v0 = 1.0

    def run(steps, corr, key=3):
        m = _model(sde="vp", sample_steps=steps, corrector_steps=corr)
        state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
        _oracle_scaled(m, v0)
        out = np.asarray(jax.jit(
            lambda r: m.pc_sample(state, r, 512))(jax.random.PRNGKey(key)))
        assert out.shape == (512, 8, 8, 1)
        return out.reshape(-1)

    def predicted_var(steps):
        tg = np.linspace(1.0, 1e-3, steps)
        B = vp_B(tg, 0.1, 20.0)
        mg, sg = np.exp(-0.5 * B), np.sqrt(1.0 - np.exp(-B))
        beta_d = 1.0 - np.exp(-(B[:-1] - B[1:]))
        var = 1.0  # prior N(0, I)
        for i, bd in enumerate(beta_d):
            big_v = mg[i] ** 2 * v0 + sg[i] ** 2
            c = 2.0 - np.sqrt(1.0 - bd) - bd / big_v
            var = c ** 2 * var + bd
        big_v = mg[-1] ** 2 * v0 + sg[-1] ** 2
        return var * ((1.0 - sg[-1] ** 2 / big_v) / mg[-1]) ** 2

    for steps in (64, 192):
        emp = run(steps, corr=0, key=steps)
        np.testing.assert_allclose(emp.var(), predicted_var(steps),
                                   rtol=0.03)
        assert abs(emp.mean()) < 0.02
    np.testing.assert_allclose(run(96, corr=1).var(), v0, rtol=0.12)


@pytest.mark.parametrize("sde", ["vp", "subvp"])
def test_vp_ode_oracle_lands_on_closed_form(sde):
    """For Gaussian data the probability flow is linear, so it preserves
    x/sqrt(V(t)) (V = m^2 v0 + sigma^2): the Heun solution from the prior
    draw x(1) must land on x(1) sqrt(V(t_eps)/V(1)), then the scaled
    Tweedie contraction (1 - sigma^2/V)/m."""
    from igm_tpu.models.score_sde import vp_B

    v0 = 4.0
    m = _model(sde=sde, sample_steps=256, sampler="ode")
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    _oracle_scaled(m, v0)
    rng = jax.random.PRNGKey(5)
    out = np.asarray(jax.jit(lambda r: m.ode_sample(state, r, 16))(rng))
    x1 = np.asarray(jax.random.normal(rng, (16, 8, 8, 1)))

    B = vp_B(np.array([1.0, 1e-3]), 0.1, 20.0)
    mg = np.exp(-0.5 * B)
    sg = (np.sqrt(1.0 - np.exp(-B)) if sde == "vp"
          else 1.0 - np.exp(-B))
    big_v = mg ** 2 * v0 + sg ** 2
    expect = (x1 * np.sqrt(big_v[1] / big_v[0])
              * (1.0 - sg[1] ** 2 / big_v[1]) / mg[1])
    np.testing.assert_allclose(out, expect, rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("sde", ["vp", "subvp"])
def test_vp_train_loss_drops(sde):
    m = _model(sde=sde, lr=3e-3)
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
    assert last < first, (first, last)


def test_subvp_pc_sample_shapes_and_finite():
    m = _model(sde="subvp", sample_steps=8, corrector_steps=1)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    out = np.asarray(jax.jit(
        lambda r: m.pc_sample(state, r, 4))(jax.random.PRNGKey(2)))
    assert out.shape == (4, 8, 8, 1)
    assert np.isfinite(out).all()
