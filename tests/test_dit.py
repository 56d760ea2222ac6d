"""DiT transformer denoiser (beyond parity — the reference only ships the
conv UNet, src/models/ddpm.py:170-261).

Covers: adaLN-Zero init property (the network's output is exactly zero at
init, so the first DDPM step starts from eps-pred = 0), patchify/unpatchify
round-trip locality, shape/conditioning contract parity with the UNet slot,
backbone swap via the model.network knob (DDPM + FlowMatching), and a
loss-drop train gate on the DDPM/DiT composition.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.config import to_node
from igm_tpu.models.ddpm import DDPM, build_denoiser
from igm_tpu.models.flow_matching import FlowMatching
from igm_tpu.networks.dit import DiT, _sincos_2d

DM = to_node({"width": 8, "height": 8, "channels": 1,
              "transforms": {"convert": True, "normalize": True}})


def _dit(**kw):
    kw.setdefault("dim", 16)
    kw.setdefault("depth", 2)
    kw.setdefault("heads", 2)
    kw.setdefault("patch", 2)
    kw.setdefault("channels", 1)
    return DiT(**kw)


def test_zero_output_at_init():
    """adaLN-Zero: every residual branch is gated to 0 and the head kernel
    is zero-initialised, so the initial prediction is exactly 0."""
    net = _dit()
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 8, 1))
    t = jnp.array([0.0, 10.0, 999.0])
    params = net.init(jax.random.PRNGKey(0), x, t)
    out = net.apply(params, x, t)
    assert out.shape == x.shape
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_patch_round_trip_locality():
    """A network whose blocks are identity (init state) with a head that we
    bypass must map patches back to their own pixels; we verify the
    patchify/unpatchify transpose pair directly instead."""
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    p, gh, gw = 2, 4, 4
    tok = x.reshape(2, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
    tok = tok.reshape(2, gh * gw, p * p * 3)
    back = tok.reshape(2, gh, gw, p, p, 3).transpose(0, 1, 3, 2, 4, 5)
    back = back.reshape(2, 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # token 0 carries exactly the top-left 2x2 patch of channel-complete rows
    np.testing.assert_array_equal(
        np.asarray(tok[0, 0]).reshape(p, p, 3), np.asarray(x[0, :2, :2, :]))


def test_sincos_table_properties():
    emb = _sincos_2d(4, 6, 32)
    assert emb.shape == (24, 32)
    # distinct positions get distinct encodings
    assert len({tuple(np.round(r, 6)) for r in emb}) == 24
    # row halves depend only on the row index: positions in the same grid
    # row share the first dim/2 channels
    same_row = emb.reshape(4, 6, 32)
    np.testing.assert_allclose(same_row[1, 0, :16], same_row[1, 5, :16],
                               rtol=0, atol=0)


def test_conditional_requires_label_and_uses_it():
    net = _dit(num_classes=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    t = jnp.array([3.0, 5.0])
    y = jnp.array([0, 3], jnp.int32)
    params = net.init(jax.random.PRNGKey(0), x, t, y)
    with pytest.raises(ValueError):
        net.apply(params, x, t)
    # gates are zero at init -> train one step is covered below; here just
    # check the label path traces and is shape-stable including null token
    out = net.apply(params, x, t, jnp.array([4, 4], jnp.int32))
    assert out.shape == x.shape


def test_build_denoiser_knob():
    unet = build_denoiser("unet", hidden_dim=8, channels=1,
                          dim_mults=(1, 2), dtype=None, num_classes=0,
                          remat=False)
    dit = build_denoiser("dit", hidden_dim=16, channels=1, dim_mults=(1,),
                         dtype=None, num_classes=0, remat=False,
                         depth=1, heads=2, patch=2)
    assert type(unet).__name__ == "Unet" and type(dit).__name__ == "DiT"
    with pytest.raises(ValueError):
        build_denoiser("resnet", hidden_dim=8, channels=1, dim_mults=(1,),
                       dtype=None, num_classes=0, remat=False)


def test_ddpm_dit_train_loss_drops():
    m = DDPM(datamodule=DM, network="dit", hidden_dim=16, depth=2, heads=2,
             patch=2, timesteps=16, compute_dtype="float32", lr=2e-3,
             loss_type="l2", sample_batch=4)
    m.steps_per_epoch = 10
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    step = jax.jit(m.train_step)
    rng = jax.random.PRNGKey(7)
    imgs = jax.random.normal(rng, (16, 8, 8, 1)) * 0.1
    batch = ((imgs + 1.0) * 127.5, jnp.zeros((16,), jnp.int32))
    first = last = None
    for i in range(30):
        state, metrics = step(state, batch)
        v = float(metrics["train_loss/loss"])
        first = v if first is None else first
        last = v
    assert last < first * 0.9, (first, last)


def test_flow_matching_dit_smoke():
    m = FlowMatching(datamodule=DM, network="dit", hidden_dim=16, depth=1,
                     heads=2, patch=2, compute_dtype="float32",
                     sample_steps=2, sample_batch=2)
    m.steps_per_epoch = 4
    state = jax.jit(m.init_state)(jax.random.PRNGKey(0))
    batch = (jnp.full((4, 8, 8, 1), 128.0), jnp.zeros((4,), jnp.int32))
    state, metrics = jax.jit(m.train_step)(state, batch)
    assert np.isfinite(float(metrics["train_loss/loss"]))
    out = m.sample(state, jax.random.PRNGKey(1), 2)
    assert out.shape == (2, 8, 8, 1) and bool(jnp.all(jnp.isfinite(out)))


def test_attention_remat_arm_is_exact():
    """attn="remat" (jax.checkpoint'd attention core) must match the XLA
    arm bitwise in the forward AND produce identical gradients — it is a
    memory schedule, not a math change (measured 0.97x on-chip, kept as a
    knob; docs/MFU.md DiT wall)."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 1)),
                    jnp.float32)
    t = jnp.asarray([3.0, 7.0])
    m_x = _dit(attn="xla")
    m_r = _dit(attn="remat")
    params = m_x.init(jax.random.PRNGKey(1), x, t)
    # perturb: adaLN-Zero output is exactly 0 at init (vacuous otherwise)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * np.float32(1.0), params)

    def loss(mod, p):
        return jnp.sum(mod.apply(p, x, t) ** 2)

    l_x, g_x = jax.value_and_grad(lambda p: loss(m_x, p))(params)
    l_r, g_r = jax.value_and_grad(lambda p: loss(m_r, p))(params)
    assert float(l_x) == float(l_r)
    for a, b in zip(jax.tree_util.tree_leaves(g_x),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_attention_flash_requires_block_divisible_tokens():
    """attn="flash" needs token_count % 128 == 0 (padded keys would get
    softmax mass); a 4x4 grid must fail loudly at trace time."""
    m = _dit(attn="flash")
    x = jnp.zeros((2, 8, 8, 1))
    with pytest.raises(ValueError, match="128"):
        m.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)))
