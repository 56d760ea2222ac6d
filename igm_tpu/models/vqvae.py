"""VQ-VAE (parity: src/models/vqvae.py).

Learned codebook (K, D) init U(-1/K, 1/K) (`vqvae.py:16-20`), gradient-based
codebook like the reference (no EMA — SURVEY.md §2 notes this consciously);
vq loss + beta*commit loss (`vqvae.py:38-39`); straight-through estimator
``z + sg(quant - z)`` (`vqvae.py:103`).  Nearest-code search runs on the MXU
(igm_tpu.ops.vq).

Quirk parity: the reference config passes ``K: 512`` which lands in
**kwargs while ``num_embeddings`` keeps its 512 default (`vqvae.py:59`);
we accept both spellings.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import instantiate
from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam
from ..core.state import TrainState, bump
from ..ops.vq import quantize
from .base import BaseModel


class VectorQuantizer(nn.Module):
    """Codebook holder; forward quantizes an NHWC latent grid."""
    num_embeddings: int
    latent_dim: int

    @nn.compact
    def __call__(self, z, train: bool = True):
        k = self.num_embeddings
        codebook = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / k, maxval=1.0 / k),
            (k, self.latent_dim))
        n, h, w, d = z.shape
        flat = z.reshape(-1, d)
        quant, idx = quantize(flat, codebook)
        vq_loss = jnp.mean((jax.lax.stop_gradient(flat) - quant) ** 2)
        commit_loss = jnp.mean((flat - jax.lax.stop_gradient(quant)) ** 2)
        return quant.reshape(n, h, w, d), vq_loss, commit_loss, idx


class VQVAE(BaseModel):
    def __init__(self, datamodule: Any, encoder: Any = None,
                 decoder: Any = None, latent_dim: int = 100,
                 lr: float = 2e-4, b1: float = 0.5, b2: float = 0.999,
                 num_embeddings: int = 512, beta: float = 0.25,
                 optim: str = "adam", **kwargs):
        super().__init__(datamodule)
        num_embeddings = int(kwargs.pop("K", num_embeddings))
        self.save_hyperparameters(latent_dim=latent_dim, lr=lr, b1=b1, b2=b2,
                                  num_embeddings=num_embeddings, beta=beta)
        self.modules = ModuleDict(
            decoder=instantiate(decoder, input_channel=latent_dim,
                                output_channel=self.channels),
            encoder=instantiate(encoder, input_channel=self.channels,
                                output_channel=latent_dim),
            vq=VectorQuantizer(num_embeddings, latent_dim),
        )
        self.latent_h = self.height // 4
        self.latent_w = self.width // 4

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        self.optimizers = OptimizerSet().add(
            "opt", adam(hp.lr, hp.b1, hp.b2), ["encoder", "decoder", "vq"])
        return self.make_state(rng, {
            "decoder": (jnp.zeros((1, self.latent_h, self.latent_w,
                                   hp.latent_dim)),),
            "encoder": (self.dummy_image_batch(1),),
            "vq": (jnp.zeros((1, self.latent_h, self.latent_w,
                              hp.latent_dim)),),
        })

    def _autoencode(self, params, mutables, imgs, train: bool,
                    straight_through: bool):
        enc_z, mut_e = self.modules.apply("encoder", params, mutables, imgs,
                                          train=train)
        (quant, vq_loss, commit, _idx), _ = self.modules.apply(
            "vq", params, mutables, enc_z, train=train)
        dec_in = enc_z + jax.lax.stop_gradient(quant - enc_z) \
            if straight_through else quant
        recon, mut_d = self.modules.apply("decoder", params, mutables, dec_in,
                                          train=train)
        recon = recon.reshape(imgs.shape)
        new_mut = {**mutables, "encoder": mut_e, "decoder": mut_d}
        return recon, vq_loss, commit, new_mut

    def train_step(self, state: TrainState, batch):
        imgs_raw, _ = batch
        state, _rng = state.next_rng()
        imgs = self.preprocess(imgs_raw)
        hp = self.hparams

        def loss_fn(params):
            recon, vq_loss, commit, new_mut = self._autoencode(
                params, state.mutables, imgs, train=True,
                straight_through=True)
            recon_loss = jnp.mean((recon - imgs) ** 2)
            total = recon_loss + vq_loss + hp.beta * commit
            metrics = {"train_loss/vq_loss": vq_loss,
                       "train_loss/recon_loss": recon_loss,
                       "train_loss/commit_loss": commit}
            return total, {"metrics": metrics, "mutables": new_mut}

        state, _, aux = self.optimizers.grad_step(state, "opt", loss_fn)
        return bump(state), aux["metrics"]

    def forward(self, state: TrainState, imgs: jnp.ndarray) -> jnp.ndarray:
        recon, _, _, _ = self._autoencode(state.params, state.mutables, imgs,
                                          train=False, straight_through=False)
        return recon

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, labels = batch
        imgs = self.preprocess(imgs_raw)
        recon = self.forward(state, imgs)
        mse = jnp.mean((imgs - recon) ** 2)
        return ({"real_image": imgs, "recon_image": recon, "label": labels},
                {"val/recon_loss": mse})
