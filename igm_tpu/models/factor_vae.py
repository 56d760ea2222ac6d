"""FactorVAE (parity: src/models/factor_vae.py).

Batch split in two (`factor_vae.py:88`); AE update = recon + KL + adv TC
term via latent discriminator; D update = permuted-vs-posterior latents,
where ``permute_dims`` shuffles each latent dim independently across the
batch (`factor_vae.py:13-22`).  The D loss reuses the AE phase's fake_logit
computed BEFORE the AE update, like the reference's retained graph.
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
from ..utils.distributions import get_decode_dist
from ..utils.losses import adversarial_loss, normal_kld
from .base import BaseModel


def permute_dims(rng: jax.Array, z: jnp.ndarray) -> jnp.ndarray:
    """Independent batch-permutation per latent dimension (factor_vae.py:13)."""
    n, d = z.shape
    keys = jax.random.split(rng, d)
    perms = jax.vmap(lambda k: jax.random.permutation(k, n))(keys)  # (d, N)
    return jnp.take_along_axis(z, perms.T, axis=0)


class FactorVAE(BaseModel):
    def __init__(self, datamodule: Any, encoder: Any = None,
                 decoder: Any = None, loss_mode: str = "lsgan",
                 adv_weight: float = 1, latent_dim: int = 10,
                 lr: float = 2e-4, lrD: float = 1e-4, ae_b1: float = 0.9,
                 ae_b2: float = 0.999, adv_b1: float = 0.5,
                 adv_b2: float = 0.9, decoder_dist: str = "gaussian"):
        super().__init__(datamodule)
        self.save_hyperparameters(loss_mode=loss_mode, adv_weight=adv_weight,
                                  latent_dim=latent_dim, lr=lr, lrD=lrD,
                                  ae_b1=ae_b1, ae_b2=ae_b2, adv_b1=adv_b1,
                                  adv_b2=adv_b2, decoder_dist=decoder_dist)
        self.modules = ModuleDict(
            decoder=instantiate(decoder, input_channel=latent_dim,
                                output_channel=self.channels,
                                output_act=self.output_act),
            encoder=instantiate(encoder, input_channel=self.channels,
                                output_channel=latent_dim * 2),
            netD=MLPEncoder(input_channel=latent_dim,
                            hidden_dims=[256, 256], output_channel=1,
                            width=1, height=1),
        )
        self.decoder_dist = get_decode_dist(decoder_dist)

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        self.optimizers = (
            OptimizerSet()
            .add("ae", adam(hp.lr, hp.ae_b1, hp.ae_b2),
                 ["encoder", "decoder"])
            .add("d", adam(hp.lrD, hp.adv_b1, hp.adv_b2), ["netD"]))
        return self.make_state(rng, {
            "decoder": (jnp.zeros((1, hp.latent_dim)),),
            "encoder": (self.dummy_image_batch(),),
            "netD": (jnp.zeros((1, hp.latent_dim)),),
        })

    def _encode(self, params, mutables, imgs, rng, train: bool):
        z2, mut = self.modules.apply("encoder", params, mutables, imgs,
                                     train=train)
        mu, log_sigma = jnp.split(z2, 2, axis=1)
        z = mu + jnp.exp(log_sigma) * jax.random.normal(rng, mu.shape)
        return z, mu, log_sigma, mut

    def train_step(self, state: TrainState, batch):
        imgs_raw, _ = batch
        state, rngs = state.next_rng(3)
        r1, r2, perm_rng = rngs
        imgs = self.preprocess(imgs_raw)
        hp = self.hparams
        mode = hp.loss_mode
        imgs1, imgs2 = jnp.split(imgs, 2, axis=0)

        # ---- AE phase (factor_vae.py:91-105)
        def ae_loss_fn(params):
            z1, mu, log_sigma, mut_e = self._encode(params, state.mutables,
                                                    imgs1, r1, train=True)
            recon, mut_d = self.modules.apply("decoder", params,
                                              state.mutables, z1)
            recon = recon.reshape(imgs1.shape)
            reg_loss = normal_kld(mu, log_sigma)
            recon_loss = -self.decoder_dist.prob(recon, imgs1).mean()
            fake_logit, _ = self.modules.apply("netD", params, state.mutables,
                                               z1)
            g_adv = adversarial_loss(fake_logit, True, mode)
            loss = recon_loss + reg_loss + hp.adv_weight * g_adv
            aux = {"z1": z1,
                   "metrics": {"train_loss/reg_loss": reg_loss,
                               "train_loss/recon_loss": recon_loss,
                               "train_loss/g_adv_loss": g_adv},
                   "mutables": {**state.mutables, "encoder": mut_e,
                                "decoder": mut_d}}
            return loss, aux

        state, _, aux = self.optimizers.grad_step(state, "ae", ae_loss_fn)
        metrics = dict(aux["metrics"])
        # the reference reuses the AE phase's retained graph for the D update
        # (`factor_vae.py:112`, backward(inputs=netD)): netD params were NOT
        # touched by the AE step, so re-evaluating netD on the detached z1
        # samples is the exact functional equivalent — and keeps the fake
        # term DIFFERENTIABLE w.r.t. netD (D must learn from both sides)
        z1_detached = jax.lax.stop_gradient(aux["z1"])

        # ---- D phase (factor_vae.py:107-115): encoder output detached
        def d_loss_fn(params):
            z2s, _, _, mut_e = self._encode(params, state.mutables, imgs2,
                                            r2, train=True)
            z2s = jax.lax.stop_gradient(z2s)
            perm_z = permute_dims(perm_rng, z2s)
            real_logit, _ = self.modules.apply("netD", params, state.mutables,
                                               perm_z)
            fake_logit, _ = self.modules.apply("netD", params, state.mutables,
                                               z1_detached)
            d_loss = (adversarial_loss(real_logit, True, mode)
                      + adversarial_loss(fake_logit, False, mode))
            return d_loss, {
                "metrics": {"train_loss/d_adv_loss": d_loss,
                            "train_log/real_logit": real_logit.mean(),
                            "train_log/fake_logit": fake_logit.mean()},
                "mutables": {**state.mutables, "encoder": mut_e}}

        state, _, aux = self.optimizers.grad_step(state, "d", d_loss_fn)
        metrics.update(aux["metrics"])
        return bump(state), metrics

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, labels = batch
        imgs = self.preprocess(imgs_raw)
        enc_rng, sample_rng = jax.random.split(rng)
        z, _mu, _ls, _ = self._encode(state.params, state.mutables, imgs,
                                      enc_rng, train=False)
        recon, _ = self.modules.apply("decoder", state.params, state.mutables,
                                      z, train=False)
        fake = self.sample(state, sample_rng, imgs.shape[0])
        return {"real_image": imgs, "fake_image": fake,
                "recon_image": recon.reshape(imgs.shape),
                "encode_latent": z, "label": labels}, {}
