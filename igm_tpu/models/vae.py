"""VAE / beta-VAE (parity: src/models/vae.py).

ELBO = -beta*KL + recon_weight*log p(x|z); reparameterised gaussian
posterior; Adam + per-epoch StepLR(0.99) (`vae.py:43-45`).  beta-VAE is just
config ``beta`` (`configs/experiment/beta_vae/*`).  One jitted train step.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import instantiate
from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam, step_lr
from ..core.state import TrainState, bump
from ..utils.distributions import get_decode_dist
from ..utils.losses import normal_kld
from .base import BaseModel


class VAE(BaseModel):
    def __init__(self, datamodule: Any = None, encoder: Any = None,
                 decoder: Any = None, latent_dim: int = 100, beta: float = 1.0,
                 recon_weight: float = 1.0, lr: float = 1e-4, b1: float = 0.9,
                 b2: float = 0.999, decoder_dist: str = "gaussian"):
        super().__init__(datamodule)
        self.save_hyperparameters(latent_dim=latent_dim, beta=beta,
                                  recon_weight=recon_weight, lr=lr, b1=b1,
                                  b2=b2, decoder_dist=decoder_dist)
        self.modules = ModuleDict(
            decoder=instantiate(decoder, input_channel=latent_dim,
                                output_channel=self.channels,
                                output_act=self.output_act),
            encoder=instantiate(encoder, input_channel=self.channels,
                                output_channel=2 * latent_dim),
        )
        self.decoder_dist = get_decode_dist(decoder_dist)

    # ------------------------------------------------------------------ state
    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        tx = adam(step_lr(hp.lr, 0.99, self.steps_per_epoch), hp.b1, hp.b2)
        self.optimizers = OptimizerSet().add("opt", tx, ["encoder", "decoder"])
        return self.make_state(rng, {
            "decoder": (jnp.zeros((1, hp.latent_dim)),),
            "encoder": (self.dummy_image_batch(),),
        })

    # ---------------------------------------------------------------- forward
    def _vae(self, params, mutables, imgs, rng, train: bool):
        z2, mut_e = self.modules.apply("encoder", params, mutables, imgs,
                                       train=train)
        mu, log_sigma = jnp.split(z2, 2, axis=1)
        z = mu + jnp.exp(log_sigma) * jax.random.normal(rng, mu.shape)
        recon, mut_d = self.modules.apply("decoder", params, mutables, z,
                                          train=train)
        recon = recon.reshape(imgs.shape[0], self.height, self.width,
                              self.channels)
        new_mut = {**mutables, "encoder": mut_e, "decoder": mut_d}
        return mu, log_sigma, z, recon, new_mut

    # ------------------------------------------------------------------ steps
    def train_step(self, state: TrainState, batch):
        imgs_raw, _labels = batch
        state, rng = state.next_rng()
        imgs = self.preprocess(imgs_raw)
        hp = self.hparams

        def loss_fn(params):
            mu, log_sigma, _z, recon, new_mut = self._vae(
                params, state.mutables, imgs, rng, train=True)
            kld = normal_kld(mu, log_sigma)
            log_p = self.decoder_dist.prob(recon, imgs).mean()
            elbo = -hp.beta * kld + hp.recon_weight * log_p
            metrics = {"train_log/elbo": elbo,
                       "train_log/kl_divergence": kld,
                       "train_log/log_p_x_of_z": log_p}
            return -elbo, {"metrics": metrics, "mutables": new_mut}

        state, _loss, aux = self.optimizers.grad_step(state, "opt", loss_fn)
        return bump(state), aux["metrics"]

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, labels = batch
        imgs = self.preprocess(imgs_raw)
        vae_rng, sample_rng = jax.random.split(rng)
        mu, log_sigma, z, recon, _ = self._vae(state.params, state.mutables,
                                               imgs, vae_rng, train=False)
        log_p = self.decoder_dist.prob(recon, imgs).mean()
        fake = self.sample(state, sample_rng, imgs.shape[0])
        result = {"real_image": imgs, "fake_image": fake, "recon_image": recon,
                  "label": labels, "encode_latent": z}
        return result, {"val_log/log_p_x_of_z": log_p}
