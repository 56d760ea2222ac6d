"""Latent diffusion (DDPM over a frozen VQ-VAE latent space) — beyond
parity; composes the reference's two stages (src/models/vqvae.py +
src/models/ddpm.py) the LDM way (Rombach et al. 2022, VQ-reg).

Fast tier: latent-space geometry + frozen-first-stage invariants.
Slow tier: first-stage checkpoint splice round-trip + e2e smoke (in
test_e2e_smoke.py).
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.config import to_node
from igm_tpu.models.latent_ddpm import LatentDDPM

DM = to_node({"width": 16, "height": 16, "channels": 1,
              "transforms": {"convert": True, "normalize": True}})


def _nets(latent_dim=8):
    enc = to_node({"_target_": "igm_tpu.networks.vqvae.Encoder",
                   "n_res_layers": 1, "res_h_dim": 8})
    dec = to_node({"_target_": "igm_tpu.networks.vqvae.Decoder",
                   "n_res_layers": 1, "res_h_dim": 8, "h_dim": 8})
    return enc, dec


def _model(**kw):
    enc, dec = _nets()
    kw.setdefault("hidden_dim", 8)
    kw.setdefault("timesteps", 4)
    kw.setdefault("dim_mults", (1,))
    kw.setdefault("latent_dim", 8)
    kw.setdefault("num_embeddings", 16)
    kw.setdefault("compute_dtype", "float32")
    m = LatentDDPM(datamodule=DM, encoder=enc, decoder=dec, **kw)
    m.steps_per_epoch = 10
    return m


@pytest.fixture(scope="module")
def ms():
    m = _model()
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    return m, state


def test_latent_geometry(ms):
    m, state = ms
    assert m._sample_shape(3) == (3, 4, 4, 8)  # 16x16 image -> 4x4 latent
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (3, 16, 16, 1))
    z = m.encode(state, imgs)
    assert z.shape == (3, 4, 4, 8)
    out = m.decode(state, z)
    assert out.shape == (3, 16, 16, 1)


def test_first_stage_is_frozen_denoiser_trains(ms):
    m, state = ms
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (4, 16, 16, 1))
    labels = jnp.zeros((4,), jnp.int32)
    state2, metrics = jax.jit(m.train_step)(state, (imgs, labels))
    assert np.isfinite(float(metrics["train_loss/loss"]))
    for name in ("encoder", "decoder", "vq"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            state.params[name], state2.params[name])
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["denoise"], state2.params["denoise"])
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0


def test_sample_decodes_to_image_space(ms):
    m, state = ms
    out = jax.jit(lambda s, r: m.sample(s, r, 2))(state, jax.random.PRNGKey(3))
    assert out.shape == (2, 16, 16, 1) and np.isfinite(np.asarray(out)).all()
    out2 = m.ddim_sample(state, jax.random.PRNGKey(4), 2, steps=2)
    assert out2.shape == (2, 16, 16, 1)


def test_latent_scale_round_trips(ms):
    """decode(encode(x)) must be invariant to latent_scale (pure units).

    The resolved scale lives in state.mutables['latent']['scale'] (so
    checkpoints carry it into the sampling tools); same init key ->
    identical first stages, only the scale differs."""
    m2 = _model(latent_scale=3.7)
    state2 = jax.jit(m2.init_state)(jax.random.PRNGKey(0))
    assert float(state2.mutables["latent"]["scale"]) == pytest.approx(3.7)
    m1, state = ms
    imgs = jax.random.uniform(jax.random.PRNGKey(5), (2, 16, 16, 1))
    a = m1.decode(state, m1.encode(state, imgs))
    b = m2.decode(state2, m2.encode(state2, imgs))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_latent_scale_auto_calibrates():
    """latent_scale=auto: on_fit_start sets the mutable scale to 1/std of
    the encoder latents, making the diffusion-space data unit-variance —
    the LDM scale_factor recipe (measured motivation: the round-5
    first-stage retrain changed the encoder scale and the fixed 1.0
    gallery regressed, benchmarks/real_runs/latent_ddpm_mnist)."""
    m = _model(latent_scale="auto")
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    assert float(state.mutables["latent"]["scale"]) == 1.0  # pre-calibration
    imgs = jax.random.uniform(jax.random.PRNGKey(6), (64, 16, 16, 1))
    state = m.on_fit_start(state, (np.asarray(imgs), None))
    z = np.asarray(m.encode(state, m.preprocess(imgs[:64])))
    assert z.std() == pytest.approx(1.0, rel=0.05)
    # a FIXED scale must not be touched by the hook
    m2 = _model(latent_scale=2.0)
    s2 = jax.jit(m2.init_state)(jax.random.PRNGKey(0))
    s2b = m2.on_fit_start(s2, (np.asarray(imgs), None))
    assert float(s2b.mutables["latent"]["scale"]) == 2.0


@pytest.mark.slow
def test_first_stage_checkpoint_splice(tmp_path):
    """A vqvae checkpoint's encoder/decoder/vq weights land in the latent
    model's state; a mismatched config fails loudly."""
    from igm_tpu.core.checkpoint import CheckpointManager
    from igm_tpu.models.vqvae import VQVAE

    enc, dec = _nets()
    vq = VQVAE(datamodule=DM, encoder=enc, decoder=dec, latent_dim=8,
               num_embeddings=16)
    vq.steps_per_epoch = 10
    vstate = jax.jit(vq.init_state)(jax.random.PRNGKey(7))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, vstate)
    mgr.wait()

    m = _model(first_stage_ckpt=str(tmp_path / "ckpt"))
    state = m.init_state(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(state.params["vq"]["embedding"]),
        np.asarray(vstate.params["vq"]["embedding"]))
    enc_leaf = jax.tree_util.tree_leaves(state.params["encoder"])[0]
    vq_leaf = jax.tree_util.tree_leaves(vstate.params["encoder"])[0]
    np.testing.assert_array_equal(np.asarray(enc_leaf), np.asarray(vq_leaf))

    bad = _model(latent_dim=4, first_stage_ckpt=str(tmp_path / "ckpt"))
    with pytest.raises(ValueError, match="shape mismatch"):
        bad.init_state(jax.random.PRNGKey(0))


def test_latent_space_never_clips_x0(ms):
    """Round-5b root cause: the pixel samplers clip implied x0 to [-1,1]
    (the data range), but the calibrated latent space is unit-variance —
    ~32% of its mass lies outside [-1,1], and clipping it collapsed the
    auto-scale gallery to gray noise.  LatentDDPM must disable the clip
    (LDM recipe: no clip_denoised in latent space) at every sampler's
    choke point, while pixel DDPM keeps the reference behavior
    (src/models/ddpm.py:390-397)."""
    from igm_tpu.models.ddpm import DDPM

    m, state = ms
    assert m.x0_bound == 0.0
    big = jnp.array([-3.0, 0.5, 7.0])
    assert jnp.array_equal(m._clip_x0(big), big)  # passthrough

    pix = DDPM(datamodule=DM, hidden_dim=8, timesteps=4, dim_mults=(1,),
               compute_dtype="float32")
    assert pix.x0_bound == 1.0
    assert jnp.array_equal(pix._clip_x0(big), jnp.array([-1.0, 0.5, 1.0]))

    # functional: one ancestral step from an extreme x_t stays unsaturated
    # for the latent model (values beyond the pixel bound survive)
    x = 5.0 * jnp.ones((2,) + m._sample_shape(1)[1:])
    t = jnp.ones((2,), jnp.int32)
    out = m.p_sample(state, x, t, jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(out))) > 1.0 + 1e-3
