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
