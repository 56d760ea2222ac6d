"""VAE-GAN (parity: src/models/vae_gan.py).

VAE whose reconstruction loss lives in discriminator FEATURE space
(`vae_gan.py:75-78`, netD built with return_features=True).  The reference's
gradient surgery (`vae_gan.py:84-88`): backward(reg+feat_recon) through
enc+dec, then scale the DECODER grads by recon_weight in place, then
backward(g_adv, inputs=decoder).  Functionally:

  grads_enc = d(reg+feat)/d_enc
  grads_dec = recon_weight * d(reg+feat)/d_dec + d(g_adv)/d_dec

computed as two grad passes and applied through one Adam update.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import instantiate
from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam
from ..core.state import TrainState, bump
from ..utils.losses import adversarial_loss, normal_kld
from .base import BaseModel


class VAEGAN(BaseModel):
    def __init__(self, datamodule: Any, encoder: Any = None,
                 decoder: Any = None, latent_dim: int = 100,
                 lr: float = 2e-4, b1: float = 0.5, b2: float = 0.999,
                 recon_weight: float = 1e-4, loss_mode: str = "vanilla"):
        super().__init__(datamodule)
        self.save_hyperparameters(latent_dim=latent_dim, lr=lr, b1=b1, b2=b2,
                                  recon_weight=recon_weight,
                                  loss_mode=loss_mode)
        self.modules = ModuleDict(
            decoder=instantiate(decoder, input_channel=latent_dim,
                                output_channel=self.channels),
            encoder=instantiate(encoder, input_channel=self.channels,
                                output_channel=2 * latent_dim),
            netD=instantiate(encoder, input_channel=self.channels,
                             output_channel=1, return_features=True),
        )

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        self.optimizers = (
            OptimizerSet()
            .add("ae", adam(hp.lr, hp.b1, hp.b2), ["encoder", "decoder"])
            .add("d", adam(hp.lr, hp.b1, hp.b2), ["netD"]))
        return self.make_state(rng, {
            "decoder": (jnp.zeros((1, hp.latent_dim)),),
            "encoder": (self.dummy_image_batch(1),),
            "netD": (self.dummy_image_batch(1),),
        })

    def _vae(self, params, mutables, imgs, rng, train: bool):
        z2, mut_e = self.modules.apply("encoder", params, mutables, imgs,
                                       train=train)
        mu, log_sigma = jnp.split(z2, 2, axis=1)
        z = mu + jnp.exp(log_sigma) * jax.random.normal(rng, mu.shape)
        recon, mut_d = self.modules.apply("decoder", params, mutables, z,
                                          train=train)
        return mu, log_sigma, z, recon.reshape(imgs.shape), mut_e, mut_d

    def train_step(self, state: TrainState, batch):
        imgs_raw, _ = batch
        state, rngs = state.next_rng(2)
        vae_rng, prior_rng = rngs
        imgs = self.preprocess(imgs_raw)
        n = imgs.shape[0]
        hp = self.hparams
        prior_z = jax.random.normal(prior_rng, (n, hp.latent_dim))

        def forward_all(params):
            mu, log_sigma, _z, recon, mut_e, mut_dec = self._vae(
                params, state.mutables, imgs, vae_rng, train=True)
            fake, _ = self.modules.apply("decoder", params,
                                         {**state.mutables, "decoder": mut_dec},
                                         prior_z)
            fake = fake.reshape(imgs.shape)
            (fake_logit, _fake_feat), mut_nd = self.modules.apply(
                "netD", params, state.mutables, fake)
            mut1 = {**state.mutables, "netD": mut_nd}
            (real_logit, real_feat), mut_nd2 = self.modules.apply(
                "netD", params, mut1, imgs)
            mut2 = {**state.mutables, "netD": mut_nd2}
            (recon_logit, recon_feat), mut_nd3 = self.modules.apply(
                "netD", params, mut2, recon)
            reg_loss = normal_kld(mu, log_sigma)
            feat_recon = ((real_feat - recon_feat) ** 2).sum() / n
            g_adv = adversarial_loss(fake_logit, True)
            d_adv = (adversarial_loss(real_logit, True)
                     + adversarial_loss(fake_logit, False))
            mutables = {**state.mutables, "encoder": mut_e,
                        "decoder": mut_dec, "netD": mut_nd3}
            metrics = {"train_loss/reg_loss": reg_loss,
                       "train_loss/feature_recon_loss": feat_recon,
                       "train_loss/g_adv_loss": g_adv,
                       "train_loss/d_adv_loss": d_adv,
                       "train_log/real_logit": real_logit.mean(),
                       "train_log/fake_logit": fake_logit.mean(),
                       "train_log/recon_logit": recon_logit.mean()}
            return (reg_loss + feat_recon, g_adv, d_adv), \
                   {"metrics": metrics, "mutables": mutables}

        full = state.params
        _out, vjp_fn, aux = jax.vjp(
            lambda p: forward_all({**state.params, **p}),
            {k: full[k] for k in ("encoder", "decoder", "netD")},
            has_aux=True)
        one, zero = jnp.ones(()), jnp.zeros(())
        g_vae = vjp_fn((one, zero, zero))[0]     # d(reg+feat)/d{enc,dec,netD}
        g_adv = vjp_fn((zero, one, zero))[0]     # d(g_adv)/d*
        g_dis = vjp_fn((zero, zero, one))[0]     # d(d_adv)/d*

        rw = hp.recon_weight
        grads_ae = {
            "encoder": g_vae["encoder"],
            "decoder": jax.tree_util.tree_map(
                lambda a, b: rw * a + b, g_vae["decoder"], g_adv["decoder"]),
        }
        state = self.optimizers.apply_grads(state, "ae", grads_ae)
        state = self.optimizers.apply_grads(state, "d",
                                            {"netD": g_dis["netD"]})
        state = state.replace(mutables=aux["mutables"])
        return bump(state), aux["metrics"]

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, labels = batch
        imgs = self.preprocess(imgs_raw)
        vae_rng, sample_rng = jax.random.split(rng)
        _mu, _ls, z, recon, _, _ = self._vae(state.params, state.mutables,
                                             imgs, vae_rng, train=False)
        fake = self.sample(state, sample_rng, imgs.shape[0])
        val_mse = jnp.mean((imgs - recon) ** 2)
        return ({"real_image": imgs, "fake_image": fake, "recon_image": recon,
                 "label": labels, "encode_latent": z},
                {"val_log/van_mse": val_mse})
