"""Resume fidelity: save/restore must reproduce the exact trajectory.

The orbax checkpoint carries {params, opt_states, mutables, step, rng}
(igm_tpu/core/checkpoint.py), so an interrupted adversarial run — including
the G/D alternation phase and the RNG stream — must continue bit-identically
to an uninterrupted one.  Lightning's implicit checkpoints in the reference
guarantee none of this (SURVEY §5 ckpt row).
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from igm_tpu.config import to_node  # noqa: E402
from igm_tpu.models.gan import GAN  # noqa: E402
import pytest

pytestmark = pytest.mark.slow  # two full interrupted runs


def _model():
    dm = to_node({"width": 8, "height": 8, "channels": 1,
                  "transforms": {"convert": True, "normalize": True}})
    net_g = to_node({"_target_": "igm_tpu.networks.basic.MLPDecoder",
                     "hidden_dims": [32], "width": 8, "height": 8,
                     "output_act": "tanh", "norm_type": "batch"})
    net_d = to_node({"_target_": "igm_tpu.networks.basic.MLPEncoder",
                     "hidden_dims": [32], "width": 8, "height": 8,
                     "norm_type": "batch"})
    m = GAN(datamodule=dm, netG=net_g, netD=net_d, latent_dim=8)
    m.steps_per_epoch = 10
    return m


def _batches(n, seed=0):
    rng = np.random.default_rng(seed)
    return [(rng.integers(0, 255, (16, 8, 8, 1), dtype=np.uint8),
             np.zeros((16,), np.int32)) for _ in range(n)]


def test_interrupted_equals_uninterrupted(tmp_path):
    from igm_tpu.core.checkpoint import CheckpointManager

    batches = _batches(8)

    # run A: straight through
    model = _model()
    step = jax.jit(model.train_step)
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    for b in batches:
        state, _ = step(state, b)
    straight = jax.device_get(state.params)

    # run B: stop after 4 steps, checkpoint, restore into a FRESH model
    model_b = _model()
    step_b = jax.jit(model_b.train_step)
    state_b = jax.jit(model_b.init_state)(jax.random.PRNGKey(0))
    for b in batches[:4]:
        state_b, _ = step_b(state_b, b)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(4, state_b)
    mgr.wait()

    model_c = _model()
    template = jax.jit(model_c.init_state)(jax.random.PRNGKey(123))
    restored = CheckpointManager(str(tmp_path / "ckpt")).restore(template)
    assert int(restored.step) == int(state_b.step)
    step_c = jax.jit(model_c.train_step)
    state_c = restored
    for b in batches[4:]:
        state_c, _ = step_c(state_c, b)
    resumed = jax.device_get(state_c.params)

    for a, b in zip(jax.tree_util.tree_leaves(straight),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_array_equal(a, b)


def test_made_pre_invariant_checkpoint_migrates_on_restore(tmp_path):
    """Checkpoints from before the zeroed-masked-kernel invariant carry
    nonzero masked kernel entries and Adam moments; MADE.on_restore must
    re-zero both so autoregressive causality survives resumed training
    (VERDICT r2 weak #6 / advisor medium)."""
    import jax.numpy as jnp
    from igm_tpu.core.checkpoint import CheckpointManager
    from igm_tpu.models.made import MADE, MADENet, build_masks

    dm = to_node({"width": 4, "height": 4, "channels": 1,
                  "transforms": {"normalize": True}})
    model = MADE(dm, hidden_dim=12, n_layer=2, lr=1e-2)
    model.steps_per_epoch = 10
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))

    # forge an OLD-format checkpoint: noise in every kernel/moment slot,
    # including the masked entries the invariant requires to be zero
    noise = jax.random.PRNGKey(99)

    def pollute(path, leaf):
        if leaf.dtype in (jnp.float32, jnp.bfloat16) and leaf.ndim >= 2:
            k = jax.random.fold_in(noise, abs(hash(str(path))) % (2 ** 31))
            # non-negative noise: a real pre-invariant checkpoint's second
            # moments (nu) are sums of squares, never negative
            return leaf + 0.05 * jnp.abs(
                jax.random.normal(k, leaf.shape)).astype(leaf.dtype)
        return leaf

    bad = state.replace(
        params=jax.tree_util.tree_map_with_path(pollute, state.params),
        opt_states=jax.tree_util.tree_map_with_path(pollute,
                                                    state.opt_states))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, bad)
    mgr.wait()

    restored = CheckpointManager(str(tmp_path / "ckpt")).restore(state)
    migrated = model.on_restore(restored)

    hidden_masks, out_small = build_masks(16, 12, 2, seed=0)
    mask_exp = np.repeat(out_small.T, 256, axis=1)

    def assert_invariant(st, where):
        p = st.params["net"]
        for li, m in enumerate(hidden_masks):
            k = np.asarray(p[f"layers_{li}"]["kernel"])
            assert np.all(k[m.T == 0] == 0.0), f"{where}: layer {li} leak"
            assert np.any(k[m.T == 1] != 0.0)
        k_out = np.asarray(p["out_layer"]["kernel"])
        assert np.all(k_out[mask_exp == 0] == 0.0), f"{where}: out leak"
        # Adam moments must be zeroed too, else updates re-pollute kernels
        for leaf_path, leaf in jax.tree_util.tree_leaves_with_path(
                st.opt_states):
            keys = [getattr(q, "key", getattr(q, "name", "")) for q in
                    leaf_path]
            if "kernel" in keys and "layers_0" in keys:
                assert np.all(
                    np.asarray(leaf)[hidden_masks[0].T == 0] == 0.0), where

    # the un-migrated restore is genuinely broken (the test would be
    # vacuous otherwise)
    k0 = np.asarray(restored.params["net"]["layers_0"]["kernel"])
    assert np.any(k0[hidden_masks[0].T == 0] != 0.0)

    assert_invariant(migrated, "after on_restore")

    # causality must hold after further training on the migrated state
    step = jax.jit(model.train_step)
    rng = np.random.default_rng(0)
    batch = (jnp.asarray(rng.integers(0, 255, (8, 4, 4, 1)), jnp.uint8),
             jnp.zeros((8,), jnp.int32))
    st = migrated
    for _ in range(5):
        st, _ = step(st, batch)
    assert_invariant(st, "after resumed training")

    net = MADENet(in_dim=16, hidden_dim=12, n_class=256, n_layer=2)

    def out_i(x, i):
        return net.apply({"params": jax.device_get(st.params["net"])},
                         x[None])[0][i].sum()

    x = jnp.asarray(np.random.default_rng(3).normal(size=(16,)), jnp.float32)
    for i in (0, 7, 15):
        g = np.asarray(jax.grad(out_i)(x, i))
        assert np.allclose(g[i:], 0.0), f"causality leak at {i}"
