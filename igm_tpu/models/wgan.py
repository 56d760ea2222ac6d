"""WGAN with weight clipping (parity: src/models/wgan.py).

RMSprop per paper (`wgan.py:50-55`); D weights clipped to ±clip_weight at the
START of every step regardless of phase (`wgan.py:67-68`) — here a functional
clamp on the netD param subtree; G updated on every (n_critic+1)-th step
(`wgan.py:70`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import instantiate
from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, clip_params, rmsprop
from ..core.state import TrainState, bump
from .base import BaseModel

NAN = jnp.nan


class WGAN(BaseModel):
    def __init__(self, datamodule: Any, netG: Any, netD: Any,
                 latent_dim: int = 100, n_critic: int = 5,
                 clip_weight: float = 0.01, lrG: float = 5e-5,
                 lrD: float = 5e-5, alpha: float = 0.99,
                 eval_fid: bool = False):
        super().__init__(datamodule)
        self.save_hyperparameters(latent_dim=latent_dim, n_critic=n_critic,
                                  clip_weight=clip_weight, lrG=lrG, lrD=lrD,
                                  alpha=alpha, eval_fid=eval_fid)
        self.modules = ModuleDict(
            netG=instantiate(netG, input_channel=latent_dim,
                             output_channel=self.channels),
            netD=instantiate(netD, input_channel=self.channels,
                             output_channel=1),
        )
        self.decoder_module_name = "netG"

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        self.optimizers = (OptimizerSet()
                           .add("g", rmsprop(hp.lrG, hp.alpha), ["netG"])
                           .add("d", rmsprop(hp.lrD, hp.alpha), ["netD"]))
        return self.make_state(rng, {
            "netG": (jnp.zeros((1, hp.latent_dim)),),
            "netD": (self.dummy_image_batch(),),
        })

    def train_step(self, state: TrainState, batch):
        imgs_raw, _ = batch
        state, z_rng = state.next_rng()
        imgs = self.preprocess(imgs_raw)
        hp = self.hparams
        z = jax.random.normal(z_rng, (imgs.shape[0], hp.latent_dim))

        # 1-Lipschitz weight clip BEFORE the update, both phases (wgan.py:67)
        state = state.replace(params={
            **state.params,
            "netD": clip_params(state.params["netD"], hp.clip_weight),
        })

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
                           "train_log/fake_logit": NAN}
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
                d_loss = real_loss + fake_loss
                metrics = {"train_loss/g_loss": NAN,
                           "train_loss/d_loss": d_loss,
                           "train_log/real_logit": -real_loss,
                           "train_log/fake_logit": fake_loss}
                return d_loss, {"metrics": metrics,
                                "mutables": {**state.mutables, "netG": mut_g,
                                             "netD": mut_d2}}

            state2, _, aux = self.optimizers.grad_step(state, "d", loss_fn)
            return state2, aux["metrics"]

        state, metrics = jax.lax.cond(state.step % (hp.n_critic + 1) == 0,
                                      g_branch, d_branch, state)
        return bump(state), metrics

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, _ = batch
        imgs = self.preprocess(imgs_raw)
        z = jax.random.normal(rng, (imgs.shape[0], self.hparams.latent_dim))
        fake = self.forward(state, z)
        return {"real_image": imgs, "fake_image": fake}, {}
