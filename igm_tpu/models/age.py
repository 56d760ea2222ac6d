"""Adversarial Generator-Encoder (parity: src/models/age.py).

Closed-form KL between the batch-fitted gaussian of latents and the prior
(`age.py:64-74`); sphere-normalized z (`age.py:76-92`); Lightning
frequency-style scheduling (1 encoder step per ``g_updates`` decoder steps,
`age.py:59-62`) as ``lax.cond`` on step % (1+g_updates); per-epoch-halving
LR schedule (`age.py:53-58`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import instantiate
from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam, halving_lr
from ..core.state import TrainState, bump
from .base import BaseModel

NAN = jnp.nan


def _normalize(z: jnp.ndarray) -> jnp.ndarray:
    return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)


def calculate_kl(samples: jnp.ndarray):
    """KL(N(batch mu, batch var) || N(0,1)) averaged over dims (age.py:64-74).

    Uses the unbiased (ddof=1) variance like torch ``Tensor.var``.
    """
    mu = samples.mean(axis=0)
    n = samples.shape[0]
    var = samples.var(axis=0) * (n / max(n - 1, 1))
    kl = (mu ** 2 + var - jnp.log(var)).mean() / 2.0
    return kl, mu.mean(), var.mean()


class AGE(BaseModel):
    def __init__(self, datamodule: Any, encoder: Any, decoder: Any,
                 lrE: float = 2e-4, lrG: float = 2e-4, latent_dim: int = 128,
                 b1: float = 0.5, b2: float = 0.999,
                 e_recon_z_weight: float = 1000, e_recon_x_weight: float = 0,
                 g_recon_z_weight: float = 0, g_recon_x_weight: float = 10,
                 norm_z: bool = True, drop_lr_epoch: int = 20,
                 g_updates: int = 2):
        super().__init__(datamodule)
        self.save_hyperparameters(
            lrE=lrE, lrG=lrG, latent_dim=latent_dim, b1=b1, b2=b2,
            e_recon_z_weight=e_recon_z_weight,
            e_recon_x_weight=e_recon_x_weight,
            g_recon_z_weight=g_recon_z_weight,
            g_recon_x_weight=g_recon_x_weight, norm_z=norm_z,
            drop_lr_epoch=drop_lr_epoch, g_updates=g_updates)
        self.modules = ModuleDict(
            decoder=instantiate(decoder, input_channel=latent_dim,
                                output_channel=self.channels),
            encoder=instantiate(encoder, input_channel=self.channels,
                                output_channel=latent_dim),
        )

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        spe = self.steps_per_epoch
        self.optimizers = (
            OptimizerSet()
            .add("e", adam(halving_lr(hp.lrE, hp.drop_lr_epoch, spe),
                           hp.b1, hp.b2), ["encoder"])
            .add("g", adam(halving_lr(hp.lrG, hp.drop_lr_epoch, spe),
                           hp.b1, hp.b2), ["decoder"]))
        return self.make_state(rng, {
            "decoder": (jnp.zeros((1, hp.latent_dim)),),
            "encoder": (self.dummy_image_batch(),),
        })

    def _encode(self, params, mutables, imgs, train: bool):
        z, mut = self.modules.apply("encoder", params, mutables, imgs,
                                    train=train)
        z = z.reshape(imgs.shape[0], -1)
        if self.hparams.norm_z:
            z = _normalize(z)
        return z, mut

    def train_step(self, state: TrainState, batch):
        imgs_raw, _ = batch
        state, z_rng = state.next_rng()
        imgs = self.preprocess(imgs_raw)
        hp = self.hparams
        z = jax.random.normal(z_rng, (imgs.shape[0], hp.latent_dim))
        if hp.norm_z:
            z = _normalize(z)

        def e_branch(state: TrainState):
            def loss_fn(params):
                real_z, mut_e = self._encode(params, state.mutables, imgs,
                                             train=True)
                real_kl, real_mu, real_var = calculate_kl(real_z)
                fake_imgs, mut_d = self.modules.apply("decoder", params,
                                                      state.mutables, z)
                fake_imgs = jax.lax.stop_gradient(
                    fake_imgs.reshape(imgs.shape))
                mut1 = {**state.mutables, "encoder": mut_e}
                fake_z, mut_e2 = self._encode(params, mut1, fake_imgs,
                                              train=True)
                fake_kl, fake_mu, fake_var = calculate_kl(fake_z)
                recon_x = jnp.float32(0.0)
                if hp.e_recon_x_weight > 0:
                    recon_imgs, _ = self.modules.apply("decoder", params,
                                                       state.mutables, real_z)
                    recon_x = jnp.mean((imgs - recon_imgs.reshape(imgs.shape)) ** 2)
                recon_z = jnp.float32(0.0)
                if hp.e_recon_z_weight > 0:
                    cos = (fake_z * z).sum(-1) / jnp.maximum(
                        jnp.linalg.norm(fake_z, axis=-1)
                        * jnp.linalg.norm(z, axis=-1), 1e-12)
                    recon_z = 1.0 - cos.mean()
                total = (real_kl - fake_kl + hp.e_recon_x_weight * recon_x
                         + hp.e_recon_z_weight * recon_z)
                metrics = {"train_loss/real_kl": real_kl,
                           "train_loss/fake_kl": fake_kl,
                           "train_loss/total_e_loss": total,
                           "train_log/real_mu": real_mu,
                           "train_log/real_var": real_var,
                           "train_log/fake_mu": fake_mu,
                           "train_log/fake_var": fake_var,
                           "train_loss/g_recon_z": NAN,
                           "train_loss/g_loss": NAN}
                return total, {"metrics": metrics,
                               "mutables": {**state.mutables,
                                            "encoder": mut_e2,
                                            "decoder": mut_d}}

            state2, _, aux = self.optimizers.grad_step(state, "e", loss_fn)
            return state2, aux["metrics"]

        def g_branch(state: TrainState):
            def loss_fn(params):
                fake_imgs, mut_d = self.modules.apply("decoder", params,
                                                      state.mutables, z)
                fake_imgs = fake_imgs.reshape(imgs.shape)
                fake_z, mut_e = self._encode(params, state.mutables,
                                             fake_imgs, train=True)
                fake_kl, _, _ = calculate_kl(fake_z)
                recon_z = jnp.float32(0.0)
                if hp.g_recon_z_weight > 0:
                    recon_z = jnp.mean((fake_z - z) ** 2)
                recon_x = jnp.float32(0.0)
                if hp.g_recon_x_weight > 0:
                    real_z, mut_e2 = self._encode(params,
                                                  {**state.mutables,
                                                   "encoder": mut_e}, imgs,
                                                  train=True)
                    mut_e = mut_e2
                    recon_imgs, _ = self.modules.apply(
                        "decoder", params,
                        {**state.mutables, "decoder": mut_d}, real_z)
                    recon_x = jnp.mean((imgs - recon_imgs.reshape(imgs.shape)) ** 2)
                total = (fake_kl + hp.g_recon_z_weight * recon_z
                         + hp.g_recon_x_weight * recon_x)
                metrics = {"train_loss/real_kl": NAN,
                           "train_loss/fake_kl": NAN,
                           "train_loss/total_e_loss": NAN,
                           "train_log/real_mu": NAN,
                           "train_log/real_var": NAN,
                           "train_log/fake_mu": NAN,
                           "train_log/fake_var": NAN,
                           "train_loss/g_recon_z": recon_z,
                           "train_loss/g_loss": total}
                return total, {"metrics": metrics,
                               "mutables": {**state.mutables,
                                            "encoder": mut_e,
                                            "decoder": mut_d}}

            state2, _, aux = self.optimizers.grad_step(state, "g", loss_fn)
            return state2, aux["metrics"]

        k = 1 + int(self.hparams.g_updates)
        state, metrics = jax.lax.cond(state.step % k == 0, e_branch, g_branch,
                                      state)
        return bump(state), metrics

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, _ = batch
        imgs = self.preprocess(imgs_raw)
        z = jax.random.normal(rng, (imgs.shape[0], self.hparams.latent_dim))
        if self.hparams.norm_z:
            z = _normalize(z)
        fake = self.forward(state, z)
        enc_z, _ = self._encode(state.params, state.mutables, imgs,
                                train=False)
        recon, _ = self.modules.apply("decoder", state.params, state.mutables,
                                      enc_z, train=False)
        return {"real_image": imgs, "fake_image": fake,
                "recon_image": recon.reshape(imgs.shape),
                "encode_latent": enc_z}, {}
