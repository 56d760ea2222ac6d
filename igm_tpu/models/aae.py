"""Adversarial Autoencoder (parity: src/models/aae.py).

Three sequential optimizer updates per batch (`aae.py:75-113`):
reconstruction (enc+dec MSE), discriminator on prior-vs-posterior latents,
then encoder adversarial — all inside one jitted step.  Prior is normal or
the circle ToyGMM (`aae.py:68-73`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import instantiate
from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam
from ..core.state import TrainState, bump
from ..networks.basic import MLPEncoder
from ..utils.losses import adversarial_loss
from ..utils.toy import ToyGMM
from .base import BaseModel


class AAE(BaseModel):
    def __init__(self, datamodule: Any, encoder: Any, decoder: Any,
                 netD: Any = None, latent_dim: int = 100,
                 loss_mode: str = "vanilla", lrG: float = 2e-4,
                 lrD: float = 2e-4, b1: float = 0.5, b2: float = 0.999,
                 recon_weight: float = 1, prior: str = "normal"):
        super().__init__(datamodule)
        self.save_hyperparameters(latent_dim=latent_dim, loss_mode=loss_mode,
                                  lrG=lrG, lrD=lrD, b1=b1, b2=b2,
                                  recon_weight=recon_weight, prior=prior)
        # netD config is accepted for signature parity but the reference
        # hard-codes an MLP discriminator on latents (`aae.py:41-43`).
        self.modules = ModuleDict(
            decoder=instantiate(decoder, input_channel=latent_dim,
                                output_channel=self.channels),
            encoder=instantiate(encoder, input_channel=self.channels,
                                output_channel=latent_dim),
            discriminator=MLPEncoder(input_channel=latent_dim,
                                     output_channel=1,
                                     hidden_dims=[256, 256], width=1,
                                     height=1, norm_type="layer"),
        )
        self._gmm = ToyGMM(10) if prior == "toy_gmm" else None

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        self.optimizers = (
            OptimizerSet()
            .add("g", adam(hp.lrG, hp.b1, hp.b2), ["encoder", "decoder"])
            .add("d", adam(hp.lrD, hp.b1, hp.b2), ["discriminator"]))
        return self.make_state(rng, {
            "decoder": (jnp.zeros((1, hp.latent_dim)),),
            "encoder": (self.dummy_image_batch(1),),
            "discriminator": (jnp.zeros((1, hp.latent_dim)),),
        })

    def sample_prior(self, rng: jax.Array, n: int) -> jnp.ndarray:
        if self._gmm is not None:
            samples, _ = self._gmm.sample(rng, n)
            return samples
        return jax.random.normal(rng, (n, self.hparams.latent_dim))

    def train_step(self, state: TrainState, batch):
        imgs_raw, _ = batch
        state, prior_rng = state.next_rng()
        imgs = self.preprocess(imgs_raw)
        n = imgs.shape[0]
        hp = self.hparams
        mode = hp.loss_mode
        metrics = {}

        # ---- phase 1: reconstruction (aae.py:81-90)
        def recon_loss_fn(params):
            q_z, mut_e = self.modules.apply("encoder", params, state.mutables,
                                            imgs)
            recon, mut_d = self.modules.apply("decoder", params,
                                              state.mutables, q_z)
            recon = recon.reshape(imgs.shape)
            loss = jnp.mean((imgs - recon) ** 2)
            return loss * hp.recon_weight, {
                "metrics": {"train_loss/recon_loss": loss},
                "mutables": {**state.mutables, "encoder": mut_e,
                             "decoder": mut_d}}

        state, _, aux = self.optimizers.grad_step(state, "g", recon_loss_fn)
        metrics.update(aux["metrics"])

        # ---- phase 2: discriminator (aae.py:92-107)
        real_prior = self.sample_prior(prior_rng, n)

        def d_loss_fn(params):
            real_logit, _ = self.modules.apply("discriminator", params,
                                               state.mutables, real_prior)
            real_loss = adversarial_loss(real_logit, True, mode)
            q_z, mut_e = self.modules.apply("encoder", params, state.mutables,
                                            imgs)
            q_z = jax.lax.stop_gradient(q_z)
            fake_logit, _ = self.modules.apply("discriminator", params,
                                               state.mutables, q_z)
            fake_loss = adversarial_loss(fake_logit, False, mode)
            d_loss = (real_loss + fake_loss) / 2.0
            return d_loss, {
                "metrics": {"train_loss/d_loss": d_loss,
                            "train_log/real_logit": real_logit.mean(),
                            "train_log/fake_logit": fake_logit.mean()},
                "mutables": {**state.mutables, "encoder": mut_e}}

        state, _, aux = self.optimizers.grad_step(state, "d", d_loss_fn)
        metrics.update(aux["metrics"])

        # ---- phase 3: encoder adversarial (aae.py:109-116)
        def g_adv_loss_fn(params):
            q_z, mut_e = self.modules.apply("encoder", params, state.mutables,
                                            imgs)
            logit, _ = self.modules.apply("discriminator", params,
                                          state.mutables, q_z)
            g_adv = adversarial_loss(logit, True, mode)
            return g_adv, {
                "metrics": {"train_loss/adv_encoder_loss": g_adv},
                "mutables": {**state.mutables, "encoder": mut_e}}

        state, _, aux = self.optimizers.grad_step(state, "g", g_adv_loss_fn)
        metrics.update(aux["metrics"])
        return bump(state), metrics

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, labels = batch
        imgs = self.preprocess(imgs_raw)
        z, _ = self.modules.apply("encoder", state.params, state.mutables,
                                  imgs, train=False)
        recon, _ = self.modules.apply("decoder", state.params, state.mutables,
                                      z, train=False)
        recon = recon.reshape(imgs.shape)
        sample_z = self.sample_prior(rng, imgs.shape[0])
        fake, _ = self.modules.apply("decoder", state.params, state.mutables,
                                     sample_z, train=False)
        fake = fake.reshape(imgs.shape)
        return {"real_image": imgs, "fake_image": fake, "recon_image": recon,
                "label": labels, "encode_latent": z}, {}
