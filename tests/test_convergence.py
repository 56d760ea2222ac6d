"""Short-horizon convergence guards: losses must actually improve.

Not a quality benchmark — a regression tripwire for optimizer wiring,
stop-gradient placement, and RNG threading (a silently-broken update rule
still produces finite losses; it just doesn't go down).
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import pytest

pytestmark = pytest.mark.slow  # multi-step training runs


def _train_collect(model, batches, metric_key):
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    step = jax.jit(model.train_step)
    values = []
    for batch in batches:
        state, metrics = step(state, batch)
        v = float(jax.device_get(metrics[metric_key]))
        if not np.isnan(v):
            values.append(v)
    return values


def _batches(n_steps, batch, shape, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 255, (batch * 4, *shape), dtype=np.uint8)
    for i in range(n_steps):
        sel = rng.integers(0, len(imgs), (batch,))
        yield (imgs[sel], np.zeros((batch,), np.int32))


def test_vae_elbo_improves():
    from igm_tpu.config import to_node
    from igm_tpu.models.vae import VAE

    dm = to_node({"width": 8, "height": 8, "channels": 1,
                  "transforms": {"convert": True, "normalize": True}})
    enc = {"_target_": "igm_tpu.networks.basic.MLPEncoder",
           "hidden_dims": [64], "width": 8, "height": 8}
    dec = {"_target_": "igm_tpu.networks.basic.MLPDecoder",
           "hidden_dims": [64], "width": 8, "height": 8,
           "output_act": "tanh"}
    model = VAE(datamodule=dm, encoder=to_node(enc), decoder=to_node(dec),
                latent_dim=8, lr=1e-3)
    model.steps_per_epoch = 100
    losses = _train_collect(model, _batches(60, 32, (8, 8, 1)),
                            "train_log/elbo")
    # elbo should increase substantially over 60 steps
    assert np.mean(losses[-10:]) > np.mean(losses[:10]) + 1.0, losses[:3]


def test_ddpm_loss_decreases():
    from igm_tpu.config import to_node
    from igm_tpu.models.ddpm import DDPM

    dm = to_node({"width": 8, "height": 8, "channels": 1,
                  "transforms": {"convert": True, "normalize": True}})
    model = DDPM(datamodule=dm, hidden_dim=8, timesteps=16, dim_mults=[1, 2],
                 lr=1e-3)
    model.steps_per_epoch = 100
    losses = _train_collect(model, _batches(60, 16, (8, 8, 1)),
                            "train_loss/loss")
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.02, losses[:3]


def test_gan_trains_and_stays_finite():
    from igm_tpu.config import to_node
    from igm_tpu.models.gan import GAN

    dm = to_node({"width": 8, "height": 8, "channels": 1,
                  "transforms": {"convert": True, "normalize": True}})
    net_g = {"_target_": "igm_tpu.networks.basic.MLPDecoder",
             "hidden_dims": [32], "width": 8, "height": 8,
             "output_act": "tanh"}
    net_d = {"_target_": "igm_tpu.networks.basic.MLPEncoder",
             "hidden_dims": [32], "width": 8, "height": 8}
    model = GAN(datamodule=dm, netG=to_node(net_g), netD=to_node(net_d),
                latent_dim=8)
    model.steps_per_epoch = 100
    g_losses = _train_collect(model, _batches(40, 32, (8, 8, 1)),
                              "train_loss/g_loss")
    d_losses = _train_collect(model, _batches(40, 32, (8, 8, 1), seed=1),
                              "train_loss/d_loss")
    assert len(g_losses) == 20 and len(d_losses) == 20  # NaN alternation mask
    assert np.isfinite(g_losses).all() and np.isfinite(d_losses).all()
    # D should learn to separate: d_loss trending down early in training
    assert np.mean(d_losses[-5:]) < np.mean(d_losses[:5])
