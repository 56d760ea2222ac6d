"""speed_gan (parity: src/models/speed_gan.py).

GAN variant that shares ONE discriminator forward between the G and D
updates per batch (`speed_gan.py:39-67`): both optimizers step every batch.
Shared-forward gradients via one ``jax.vjp`` linearisation of
``f(pG, pD) -> (g_loss, d_loss)``, pulling back two unit cotangents — the
cross-gradients (g_loss into D, d_loss into G-through-detached-fake) are
discarded exactly like the reference's zero_grad/inputs= plumbing.
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


class GAN(BaseModel):  # class name parity with the reference file
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

    def train_step(self, state: TrainState, batch):
        imgs_raw, _ = batch
        state, z_rng = state.next_rng()
        imgs = self.preprocess(imgs_raw)
        hp = self.hparams
        mode = hp.loss_mode
        z = jax.random.normal(z_rng, (imgs.shape[0], hp.latent_dim))

        g_sub = {"netG": state.params["netG"]}
        d_sub = {"netD": state.params["netD"]}

        def f(pg, pd):
            params = {**state.params, **pg, **pd}
            fake, mut_g = self.modules.apply("netG", params, state.mutables, z)
            pred_fake, mut_d = self.modules.apply("netD", params,
                                                  state.mutables, fake)
            mut1 = {**state.mutables, "netD": mut_d}
            pred_real, mut_d2 = self.modules.apply("netD", params, mut1, imgs)
            real_loss = adversarial_loss(pred_real, True, mode)
            fake_loss = adversarial_loss(pred_fake, False, mode)
            g_loss = adversarial_loss(pred_fake, True, mode)
            d_loss = (real_loss + fake_loss) / 2.0
            metrics = {"train_loss/d_loss": d_loss,
                       "train_loss/g_loss": g_loss,
                       "train_log/pred_real": pred_real.mean(),
                       "train_log/pred_fake": pred_fake.mean()}
            mutables = {**state.mutables, "netG": mut_g, "netD": mut_d2}
            return (g_loss, d_loss), {"metrics": metrics, "mutables": mutables}

        _losses, vjp_fn, aux = jax.vjp(f, g_sub, d_sub, has_aux=True)
        grads_g = vjp_fn((jnp.ones(()), jnp.zeros(())))[0]
        grads_d = vjp_fn((jnp.zeros(()), jnp.ones(())))[1]
        state = self.optimizers.apply_grads(state, "g", grads_g)
        state = self.optimizers.apply_grads(state, "d", grads_d)
        state = state.replace(mutables=aux["mutables"])
        return bump(state), aux["metrics"]

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, _ = batch
        imgs = self.preprocess(imgs_raw)
        z = jax.random.normal(rng, (imgs.shape[0], self.hparams.latent_dim))
        fake = self.forward(state, z)
        return {"real_image": imgs, "fake_image": fake}, {}
