"""GAN / LSGAN / GGAN-hinge (parity: src/models/gan.py).

The reference alternates G/D on even/odd batch index with two Adam
optimizers (`gan.py:38-75`); here both phases live in ONE jitted step and
``lax.cond`` selects on ``state.step % 2`` — no host round-trip, no
recompilation.  Inactive-phase metrics are NaN (skipped by the logger).
D's ``.detach()`` on fake images (`gan.py:62`) maps to
``jax.lax.stop_gradient``; implicit detachment of the non-updated network is
handled by differentiating only the owned parameter subset (OptimizerSet).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import instantiate
from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam
from ..core.state import TrainState, bump
from ..utils.losses import adversarial_loss
from .base import BaseModel

NAN = jnp.nan


class GAN(BaseModel):
    def __init__(self, datamodule: Any, netG: Any, netD: Any,
                 latent_dim: int = 100, loss_mode: str = "vanilla",
                 lrG: float = 2e-4, lrD: float = 2e-4, b1: float = 0.5,
                 b2: float = 0.999):
        super().__init__(datamodule)
        self.save_hyperparameters(latent_dim=latent_dim, loss_mode=loss_mode,
                                  lrG=lrG, lrD=lrD, b1=b1, b2=b2)
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
                           .add("g", adam(hp.lrG, hp.b1, hp.b2), ["netG"])
                           .add("d", adam(hp.lrD, hp.b1, hp.b2), ["netD"]))
        return self.make_state(rng, {
            "netG": (jnp.zeros((1, hp.latent_dim)),),
            "netD": (self.dummy_image_batch(),),
        })

    # ------------------------------------------------------------------ steps
    def train_step(self, state: TrainState, batch):
        imgs_raw, _ = batch
        state, z_rng = state.next_rng()
        imgs = self.preprocess(imgs_raw)
        n = imgs.shape[0]
        hp = self.hparams
        z = jax.random.normal(z_rng, (n, hp.latent_dim))
        mode = hp.loss_mode

        def g_branch(state: TrainState):
            def loss_fn(params):
                fake, mut_g = self.modules.apply("netG", params,
                                                 state.mutables, z)
                pred_fake, mut_d = self.modules.apply("netD", params,
                                                      state.mutables, fake)
                g_loss = adversarial_loss(pred_fake, True, mode)
                metrics = {"train_loss/g_loss": g_loss,
                           "train_loss/d_loss": NAN,
                           "train_log/pred_real": NAN,
                           "train_log/pred_fake": NAN}
                new_mut = {**state.mutables, "netG": mut_g, "netD": mut_d}
                return g_loss, {"metrics": metrics, "mutables": new_mut}

            state2, _, aux = self.optimizers.grad_step(state, "g", loss_fn)
            return state2, aux["metrics"]

        def d_branch(state: TrainState):
            def loss_fn(params):
                pred_real, mut_d = self.modules.apply("netD", params,
                                                      state.mutables, imgs)
                real_loss = adversarial_loss(pred_real, True, mode)
                fake, mut_g = self.modules.apply("netG", params,
                                                 state.mutables, z)
                fake = jax.lax.stop_gradient(fake)
                mut1 = {**state.mutables, "netD": mut_d}
                pred_fake, mut_d2 = self.modules.apply("netD", params, mut1,
                                                       fake)
                fake_loss = adversarial_loss(pred_fake, False, mode)
                d_loss = (real_loss + fake_loss) / 2.0
                metrics = {"train_loss/g_loss": NAN,
                           "train_loss/d_loss": d_loss,
                           "train_log/pred_real": pred_real.mean(),
                           "train_log/pred_fake": pred_fake.mean()}
                new_mut = {**state.mutables, "netG": mut_g, "netD": mut_d2}
                return d_loss, {"metrics": metrics, "mutables": new_mut}

            state2, _, aux = self.optimizers.grad_step(state, "d", loss_fn)
            return state2, aux["metrics"]

        state, metrics = jax.lax.cond(state.step % 2 == 0, g_branch, d_branch,
                                      state)
        return bump(state), metrics

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, _ = batch
        imgs = self.preprocess(imgs_raw)
        z = jax.random.normal(rng, (imgs.shape[0], self.hparams.latent_dim))
        fake = self.forward(state, z)
        return {"real_image": imgs, "fake_image": fake}, {}
