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
    """Codebook holder; forward quantizes an NHWC latent grid.

    Two codebook-update modes:

    * ``ema=False`` (default, reference parity): the codebook is a trained
      parameter pulled toward encoder outputs by the vq loss
      (`src/models/vqvae.py:38-39`).  Measured failure mode on the real
      digits: the U(-1/K, 1/K) init clusters every code near zero, the
      encoder's scale grows with reconstruction learning, and the
      commitment distance transiently explodes (up to ~91 per-dim MSE,
      `benchmarks/real_runs/vqvae_mnist{,_r5}/curves.json`) until Adam
      drags the live codes back — recovery timing is run-dependent.
    * ``ema=True`` (beyond parity): exponential-moving-average cluster
      means (van den Oord 2017, appendix A.1).  The codebook lives in the
      ``codebook`` MUTABLE collection (no optimizer state); each train
      step moves every used code directly toward the mean of the encoder
      vectors assigned to it, so the codebook tracks the encoder's scale
      by construction and the explosion cannot occur.  The count/sum
      statistics are two MXU-friendly one-hot contractions.
    """
    num_embeddings: int
    latent_dim: int
    ema: bool = False
    ema_decay: float = 0.99
    ema_eps: float = 1e-5

    @nn.compact
    def __call__(self, z, train: bool = True):
        k = self.num_embeddings

        def _init_uniform():
            return jax.random.uniform(
                self.make_rng("params"), (k, self.latent_dim),
                minval=-1.0 / k, maxval=1.0 / k)

        if self.ema:
            emb = self.variable("codebook", "embedding", _init_uniform)
            cluster_size = self.variable(
                "codebook", "cluster_size", lambda: jnp.zeros((k,)))
            cluster_sum = self.variable(
                "codebook", "cluster_sum", lambda: emb.value)
            codebook = emb.value
        else:
            codebook = self.param(
                "embedding",
                lambda key, shape: jax.random.uniform(
                    key, shape, minval=-1.0 / k, maxval=1.0 / k),
                (k, self.latent_dim))
        n, h, w, d = z.shape
        flat = z.reshape(-1, d)
        quant, idx = quantize(flat, codebook)
        commit_loss = jnp.mean((flat - jax.lax.stop_gradient(quant)) ** 2)
        if not self.ema:
            vq_loss = jnp.mean((jax.lax.stop_gradient(flat) - quant) ** 2)
            return quant.reshape(n, h, w, d), vq_loss, commit_loss, idx

        if train and not self.is_initializing():
            g = self.ema_decay
            onehot = jax.nn.one_hot(idx, k, dtype=jnp.float32)  # (M, K)
            counts = jnp.sum(onehot, axis=0)                    # (K,)
            sums = jnp.dot(onehot.T, jax.lax.stop_gradient(flat),
                           preferred_element_type=jnp.float32)  # (K, D)
            cs = g * cluster_size.value + (1.0 - g) * counts
            csum = g * cluster_sum.value + (1.0 - g) * sums
            total = jnp.sum(cs)
            # Laplace smoothing keeps dead codes finite without a branch.
            smoothed = (cs + self.ema_eps) / (
                total + k * self.ema_eps) * total
            cluster_size.value = cs
            cluster_sum.value = csum
            emb.value = csum / smoothed[:, None]
        vq_loss = jnp.zeros((), flat.dtype)  # nothing gradient-trained
        return quant.reshape(n, h, w, d), vq_loss, commit_loss, idx


class VQVAE(BaseModel):
    def __init__(self, datamodule: Any, encoder: Any = None,
                 decoder: Any = None, latent_dim: int = 100,
                 lr: float = 2e-4, b1: float = 0.5, b2: float = 0.999,
                 num_embeddings: int = 512, beta: float = 0.25,
                 optim: str = "adam", codebook_update: str = "gradient",
                 ema_decay: float = 0.99, **kwargs):
        super().__init__(datamodule)
        num_embeddings = int(kwargs.pop("K", num_embeddings))
        if codebook_update not in ("gradient", "ema"):
            raise ValueError(f"codebook_update={codebook_update!r} "
                             "(expected 'gradient' or 'ema')")
        self.save_hyperparameters(latent_dim=latent_dim, lr=lr, b1=b1, b2=b2,
                                  num_embeddings=num_embeddings, beta=beta,
                                  codebook_update=codebook_update,
                                  ema_decay=ema_decay)
        self.modules = ModuleDict(
            decoder=instantiate(decoder, input_channel=latent_dim,
                                output_channel=self.channels),
            encoder=instantiate(encoder, input_channel=self.channels,
                                output_channel=latent_dim),
            vq=VectorQuantizer(num_embeddings, latent_dim,
                               ema=(codebook_update == "ema"),
                               ema_decay=ema_decay),
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
        (quant, vq_loss, commit, _idx), mut_q = self.modules.apply(
            "vq", params, mutables, enc_z, train=train)
        dec_in = enc_z + jax.lax.stop_gradient(quant - enc_z) \
            if straight_through else quant
        recon, mut_d = self.modules.apply("decoder", params, mutables, dec_in,
                                          train=train)
        recon = recon.reshape(imgs.shape)
        new_mut = {**mutables, "encoder": mut_e, "decoder": mut_d,
                   "vq": mut_q}
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

    def codebook(self, state: TrainState) -> jnp.ndarray:
        """The (K, D) codebook, wherever the update mode keeps it
        (gradient -> params, ema -> the ``codebook`` mutable collection)."""
        if self.hparams.codebook_update == "ema":
            return jnp.asarray(state.mutables["vq"]["codebook"]["embedding"])
        return jnp.asarray(state.params["vq"]["embedding"])

    def sample(self, state: TrainState, rng: jax.Array, n: int) -> jnp.ndarray:
        """Decode a uniform-random grid of code indices.

        A VQ-VAE has no learned prior over codes — the reference says so
        itself (`src/models/vqvae.py:78` "Directly sample from embeddings
        will not produce meaningful images") and its inherited
        ``sample(N)`` crashes on the conv decoder.  This override keeps
        the generic sampling/export tools runnable and makes the
        semantics explicit; the TRAINED prior over this latent space is
        ``experiment=latent_ddpm/*``."""
        idx = jax.random.randint(
            rng, (n, self.latent_h * self.latent_w), 0,
            int(self.hparams.num_embeddings))
        quant = self.codebook(state)[idx].reshape(
            n, self.latent_h, self.latent_w, int(self.hparams.latent_dim))
        imgs, _ = self.modules.apply("decoder", state.params, state.mutables,
                                     quant, train=False)
        return imgs.reshape(n, self.height, self.width, self.channels)

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, labels = batch
        imgs = self.preprocess(imgs_raw)
        recon = self.forward(state, imgs)
        mse = jnp.mean((imgs - recon) ** 2)
        return ({"real_image": imgs, "recon_image": recon, "label": labels},
                {"val/recon_loss": mse})
