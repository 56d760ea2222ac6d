"""WGAN-GP (parity: src/models/wgan_gp.py).

The gradient penalty — the reference's only higher-order-AD site
(`wgan_gp.py:82-97`, ``torch.autograd.grad(..., create_graph=True)``) — is
``jax.grad`` of the critic w.r.t. the interpolated images inside the loss;
grad-of-grad composes for free.  Networks are instantiated with
``norm_type="layer"`` like the reference (`wgan_gp.py:30-31`) unless the
config overrides it.  G updated on step % (n_critic+1) == n_critic
(`wgan_gp.py:63`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import instantiate
from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam
from ..core.state import TrainState, bump
from .base import BaseModel

NAN = jnp.nan


class WGAN(BaseModel):  # class name parity with the reference file
    def __init__(self, datamodule: Any, netG: Any, netD: Any,
                 latent_dim: int = 100, n_critic: int = 5, lrG: float = 1e-4,
                 lrD: float = 1e-4, b1: float = 0.0, b2: float = 0.9,
                 gp_weight: float = 10):
        super().__init__(datamodule)
        self.save_hyperparameters(latent_dim=latent_dim, n_critic=n_critic,
                                  lrG=lrG, lrD=lrD, b1=b1, b2=b2,
                                  gp_weight=gp_weight)
        # The reference FORCES layer norm via explicit instantiate kwargs
        # (`wgan_gp.py:30-31`), silently overriding the experiments'
        # `norm_type: instance` config overrides; we reproduce that.
        netG = dict(netG, norm_type="layer")
        netD = dict(netD, norm_type="layer")
        self.modules = ModuleDict(
            netG=instantiate(netG, input_channel=latent_dim,
                             output_channel=self.channels),
            netD=instantiate(netD, input_channel=self.channels,
                             output_channel=1),
        )

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        self.optimizers = (OptimizerSet()
                           .add("g", adam(hp.lrG, hp.b1, hp.b2), ["netG"])
                           .add("d", adam(hp.lrD, hp.b1, hp.b2), ["netD"]))
        return self.make_state(rng, {
            "netG": (jnp.zeros((1, hp.latent_dim)),),
            "netD": (self.dummy_image_batch(),),
        })

    def forward(self, state: TrainState, z: jnp.ndarray) -> jnp.ndarray:
        out, _ = self.modules.apply("netG", state.params, state.mutables, z,
                                    train=False)
        return out.reshape(z.shape[0], self.height, self.width, self.channels)

    def train_step(self, state: TrainState, batch):
        imgs_raw, _ = batch
        state, rngs = state.next_rng(2)
        z_rng, lerp_rng = rngs
        imgs = self.preprocess(imgs_raw)
        n = imgs.shape[0]
        hp = self.hparams
        z = jax.random.normal(z_rng, (n, hp.latent_dim))

        def g_branch(state: TrainState):
            def loss_fn(params):
                fake, mut_g = self.modules.apply("netG", params,
                                                 state.mutables, z)
                pred, mut_d = self.modules.apply("netD", params,
                                                 state.mutables, fake)
                g_loss = -pred.mean()
                metrics = {"train_loss/g_loss": g_loss,
                           "train_loss/d_loss": NAN,
                           "train_log/real_logit": NAN,
                           "train_log/fake_logit": NAN,
                           "train_log/gradient_panelty": NAN}
                return g_loss, {"metrics": metrics,
                                "mutables": {**state.mutables, "netG": mut_g,
                                             "netD": mut_d}}

            state2, _, aux = self.optimizers.grad_step(state, "g", loss_fn)
            return state2, aux["metrics"]

        def d_branch(state: TrainState):
            def loss_fn(params):
                pred_real, mut_d = self.modules.apply("netD", params,
                                                      state.mutables, imgs)
                real_loss = -pred_real.mean()
                fake, mut_g = self.modules.apply("netG", params,
                                                 state.mutables, z)
                fake = jax.lax.stop_gradient(fake)
                mut1 = {**state.mutables, "netD": mut_d}
                pred_fake, mut_d2 = self.modules.apply("netD", params, mut1,
                                                       fake)
                fake_loss = pred_fake.mean()

                # gradient penalty on x-interpolates (wgan_gp.py:82-97)
                lerp = jax.random.uniform(lerp_rng, (n, 1, 1, 1))
                inter_x = lerp * imgs + (1.0 - lerp) * fake

                def critic_sum(x):
                    out, _ = self.modules.apply(
                        "netD", params, mut1, x, train=True,
                        update_stats=False)
                    return out.sum()

                gradients = jax.grad(critic_sum)(inter_x)
                g_norm = jnp.sqrt(
                    (gradients.reshape(n, -1) ** 2).sum(axis=1) + 1e-12)
                gp = ((g_norm - 1.0) ** 2).mean()

                d_loss = real_loss + fake_loss + hp.gp_weight * gp
                metrics = {"train_loss/g_loss": NAN,
                           "train_loss/d_loss": d_loss,
                           "train_log/real_logit": -real_loss,
                           "train_log/fake_logit": fake_loss,
                           "train_log/gradient_panelty": gp}
                return d_loss, {"metrics": metrics,
                                "mutables": {**state.mutables, "netG": mut_g,
                                             "netD": mut_d2}}

            state2, _, aux = self.optimizers.grad_step(state, "d", loss_fn)
            return state2, aux["metrics"]

        k = hp.n_critic + 1
        state, metrics = jax.lax.cond(state.step % k == hp.n_critic,
                                      g_branch, d_branch, state)
        return bump(state), metrics

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, _ = batch
        imgs = self.preprocess(imgs_raw)
        z = jax.random.normal(rng, (imgs.shape[0], self.hparams.latent_dim))
        fake = self.forward(state, z)
        return {"real_image": imgs, "fake_image": fake}, {}
