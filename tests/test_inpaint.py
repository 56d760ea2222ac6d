"""RePaint-style diffusion inpainting (beyond parity — the reference's
closest capabilities are DDPM interpolate, src/models/ddpm.py:417-431, and
TAR top-half completion; it has no diffusion inpainting).

Covers: exact known-pixel composite, the all-known degenerate case, hole
generation actually happening (and staying finite), the resampling
(U>1) path, an eps-oracle consistency check (with a constant-x0 oracle the
hole must land on that constant — pins the known/unknown level alignment),
CFG-conditional inpainting, and the latent model's encode/min-pool/decode
override.
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
    kw.setdefault("timesteps", 16)
    m = DDPM(datamodule=DM, **kw)
    m.steps_per_epoch = 10
    return m


@pytest.fixture(scope="module")
def ms():
    m = _model()
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    return m, state


def _half_mask():
    mask = np.ones((1, 8, 8, 1), np.float32)
    mask[:, :, 4:] = 0.0  # right half is the hole
    return jnp.asarray(mask)


def _x0(n=2):
    return jnp.tile(jnp.linspace(-1, 1, 8)[None, None, :, None], (n, 8, 1, 1))


def test_known_pixels_exact(ms):
    m, state = ms
    x0, mask = _x0(), _half_mask()
    out = jax.jit(lambda r: m.inpaint(state, r, x0, mask))(
        jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(out)[:, :, :4],
                                  np.asarray(x0)[:, :, :4])
    assert np.isfinite(np.asarray(out)).all()
    # the hole was actually generated, not copied through
    assert np.abs(np.asarray(out - x0)[:, :, 4:]).max() > 1e-3


def test_all_known_is_identity(ms):
    m, state = ms
    x0 = _x0()
    out = m.inpaint(state, jax.random.PRNGKey(2), x0, jnp.ones_like(x0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x0))


def test_resample_path(ms):
    m, state = ms
    x0, mask = _x0(), _half_mask()
    out = jax.jit(lambda r: m.inpaint(state, r, x0, mask, resample=3))(
        jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(out)[:, :, :4],
                                  np.asarray(x0)[:, :, :4])
    assert np.isfinite(np.asarray(out)).all()


def test_constant_x0_oracle_fills_hole(ms):
    """With an eps-oracle whose implied x0 is the constant c, every reverse
    step's posterior mean is exact, so the inpainted hole must converge to
    c (up to the final t=0 posterior noise, which is ~sqrt(beta_0) small).
    Pins the t-1 level alignment between known and unknown branches."""
    m, state = ms
    c = -0.25
    acp = m.tables.alphas_cumprod

    def oracle_eps(state, x, t, y=None, guidance=1.0):
        a = acp[t.astype(jnp.int32)].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(a) * c) / jnp.sqrt(1.0 - a)

    orig = m._eps
    m._eps = oracle_eps
    try:
        x0 = jnp.full((2, 8, 8, 1), c)
        out = m.inpaint(state, jax.random.PRNGKey(4), x0, _half_mask())
    finally:
        m._eps = orig
    hole = np.asarray(out)[:, :, 4:]
    assert np.abs(hole - c).max() < 0.05, np.abs(hole - c).max()


def test_conditional_inpaint():
    m = _model(num_classes=3)
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    x0, mask = _x0(), _half_mask()
    y = jnp.array([0, 2], jnp.int32)
    out = jax.jit(lambda r: m.inpaint(state, r, x0, mask, y=y,
                                      guidance=2.0))(jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(out)[:, :, :4],
                                  np.asarray(x0)[:, :, :4])
    assert np.isfinite(np.asarray(out)).all()


def test_latent_inpaint():
    from igm_tpu.config import compose, instantiate
    repo = Path(__file__).resolve().parent.parent
    cfg = compose(repo / "configs",
                  ["experiment=latent_ddpm/mnist", "model.hidden_dim=8",
                   "model.timesteps=8",
                   "model.compute_dtype=float32", "print_config=False"])
    m = instantiate(cfg.model, datamodule=cfg.datamodule)
    m.steps_per_epoch = 10
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    h, w, c = m.height, m.width, m.channels
    x0 = jnp.tile(jnp.linspace(-1, 1, w)[None, None, :, None], (2, h, 1, c))
    mask = np.ones((1, h, w, 1), np.float32)
    mask[:, :, w // 2:] = 0.0
    out = jax.jit(lambda r: m.inpaint(state, r, x0, jnp.asarray(mask)))(
        jax.random.PRNGKey(6))
    assert out.shape == x0.shape
    np.testing.assert_array_equal(np.asarray(out)[:, :, : w // 2],
                                  np.asarray(x0)[:, :, : w // 2])
    assert np.isfinite(np.asarray(out)).all()
