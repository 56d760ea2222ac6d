"""Conditional VAE (parity: src/models/cvae.py).

q(z|x,c): one-hot label broadcast to every pixel and concatenated to the
encoder input (`cvae.py:67-69`); p(x|z,c): learned class embedding
concatenated to z for the decoder (`cvae.py:44-47`, decoder input is
latent_dim*2).  ``sample`` draws a grid of all classes (`cvae.py:92-96`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import instantiate
from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam, step_lr
from ..core.state import TrainState, bump
from ..utils.distributions import get_decode_dist
from ..utils.losses import normal_kld
from .base import BaseModel


class _ClassEmbedding(nn.Module):
    n_classes: int
    dim: int

    @nn.compact
    def __call__(self, labels, train: bool = True):
        emb = self.param("embedding", nn.initializers.normal(1.0),
                         (self.n_classes, self.dim))
        return emb[labels]


class cVAE(BaseModel):
    def __init__(self, datamodule: Any = None, encoder: Any = None,
                 decoder: Any = None, latent_dim: int = 100,
                 beta: float = 1.0, recon_weight: float = 1.0,
                 lr: float = 1e-4, b1: float = 0.9, b2: float = 0.999,
                 n_classes: int = None, encode_label: bool = True,
                 decoder_dist: str = "gaussian"):
        super().__init__(datamodule)
        self.save_hyperparameters(latent_dim=latent_dim, beta=beta,
                                  recon_weight=recon_weight, lr=lr, b1=b1,
                                  b2=b2, n_classes=n_classes,
                                  encode_label=encode_label,
                                  decoder_dist=decoder_dist)
        self.n_classes = int(n_classes)
        enc_in = self.channels + (self.n_classes if encode_label else 0)
        self.modules = ModuleDict(
            decoder=instantiate(decoder, input_channel=latent_dim * 2,
                                output_channel=self.channels,
                                output_act=self.output_act),
            encoder=instantiate(encoder, input_channel=enc_in,
                                output_channel=2 * latent_dim),
            class_embedding=_ClassEmbedding(self.n_classes, latent_dim),
        )
        self.decoder_dist = get_decode_dist(decoder_dist)

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        tx = adam(step_lr(hp.lr, 0.99, self.steps_per_epoch), hp.b1, hp.b2)
        self.optimizers = OptimizerSet().add(
            "opt", tx, ["encoder", "decoder", "class_embedding"])
        enc_in = self.channels + (self.n_classes if hp.encode_label else 0)
        return self.make_state(rng, {
            "decoder": (jnp.zeros((1, hp.latent_dim * 2)),),
            "encoder": (jnp.zeros((1, self.height, self.width, enc_in)),),
            "class_embedding": (jnp.zeros((1,), jnp.int32),),
        })

    def decode(self, params, mutables, z, labels, train: bool):
        emb, _ = self.modules.apply("class_embedding", params, mutables,
                                    labels, train=train)
        zc = jnp.concatenate([z, emb], axis=1)
        out, mut_d = self.modules.apply("decoder", params, mutables, zc,
                                        train=train)
        return out.reshape(z.shape[0], self.height, self.width,
                           self.channels), mut_d

    def _vae(self, params, mutables, imgs, labels, rng, train: bool):
        hp = self.hparams
        x = imgs
        if hp.encode_label:
            onehot = jax.nn.one_hot(labels, self.n_classes)
            onehot = jnp.broadcast_to(onehot[:, None, None, :],
                                      (*imgs.shape[:3], self.n_classes))
            x = jnp.concatenate([imgs, onehot], axis=-1)
        z2, mut_e = self.modules.apply("encoder", params, mutables, x,
                                       train=train)
        mu, log_sigma = jnp.split(z2, 2, axis=1)
        z = mu + jnp.exp(log_sigma) * jax.random.normal(rng, mu.shape)
        recon, mut_d = self.decode(params, mutables, z, labels, train)
        return mu, log_sigma, z, recon, mut_e, mut_d

    def train_step(self, state: TrainState, batch):
        imgs_raw, labels = batch
        state, rng = state.next_rng()
        imgs = self.preprocess(imgs_raw)
        hp = self.hparams

        def loss_fn(params):
            mu, log_sigma, _z, recon, mut_e, mut_d = self._vae(
                params, state.mutables, imgs, labels, rng, train=True)
            kld = normal_kld(mu, log_sigma)
            log_p = self.decoder_dist.prob(recon, imgs).mean()
            elbo = -hp.beta * kld + hp.recon_weight * log_p
            metrics = {"train_log/elbo": elbo,
                       "train_log/kl_divergence": kld,
                       "train_log/log_p_x_of_z": log_p}
            return -elbo, {"metrics": metrics,
                           "mutables": {**state.mutables, "encoder": mut_e,
                                        "decoder": mut_d}}

        state, _, aux = self.optimizers.grad_step(state, "opt", loss_fn)
        return bump(state), aux["metrics"]

    def sample(self, state: TrainState, rng: jax.Array, n: int) -> jnp.ndarray:
        """One row of n samples per class (cvae.py:92-96)."""
        labels = jnp.tile(jnp.arange(self.n_classes)[:, None],
                          (1, n)).reshape(-1)
        z = jax.random.normal(rng, (n * self.n_classes,
                                    self.hparams.latent_dim))
        imgs, _ = self.decode(state.params, state.mutables, z, labels,
                              train=False)
        return imgs

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, labels = batch
        imgs = self.preprocess(imgs_raw)
        vae_rng, sample_rng = jax.random.split(rng)
        mu, log_sigma, z, recon, _, _ = self._vae(
            state.params, state.mutables, imgs, labels, vae_rng, train=False)
        log_p = self.decoder_dist.prob(recon, imgs).mean()
        fake = self.sample(state, sample_rng, 8)
        return ({"real_image": imgs, "fake_image": fake, "recon_image": recon,
                 "label": labels, "encode_latent": z},
                {"val_log/log_p_x_of_z": log_p})
