"""BiGAN (parity: src/models/BiGAN.py).

Joint discriminator D(x, z) with three sub-MLPs (`BiGAN.py:100-126`).  The
reference computes real/fake pair logits ONCE and reuses them for both the
G(encoder+decoder) and D updates with retain_graph (`BiGAN.py:61-88`).  Here
the shared forward is a single ``jax.vjp`` linearisation of
``f(params_g, params_d) -> (g_loss, d_loss)``; pulling back the two unit
cotangents yields exactly dG g_loss and dD d_loss with one forward pass —
the functional equivalent of retain_graph + ``backward(inputs=...)``.
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
from ..networks.basic import MLPEncoder
from ..utils.losses import adversarial_loss
from .base import BaseModel


class Discriminator(nn.Module):
    """(BiGAN.py:100-126): dis_z MLP + dis_x (config encoder) + pair MLP."""
    encoder_cfg: Any
    input_channel: int
    latent_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x, z, train: bool = True):
        dis_z = MLPEncoder(input_channel=self.latent_dim,
                           output_channel=self.hidden_dim, width=1, height=1,
                           hidden_dims=[self.hidden_dim, self.hidden_dim],
                           output_act="leaky_relu")
        dis_x = instantiate(self.encoder_cfg, input_channel=self.input_channel,
                            output_channel=self.hidden_dim)
        dis_pair = MLPEncoder(input_channel=2 * self.hidden_dim,
                              output_channel=1, width=1, height=1,
                              hidden_dims=[self.hidden_dim])
        z_feat = dis_z(z, train=train)
        x_feat = dis_x(x, train=train)
        return dis_pair(jnp.concatenate([z_feat, x_feat], axis=1), train=train)


class BiGAN(BaseModel):
    def __init__(self, datamodule: Any, encoder: Any, decoder: Any,
                 latent_dim: int = 100, hidden_dim: int = 512,
                 loss_mode: str = "vanilla", lrG: float = 2e-4,
                 lrD: float = 2e-4, b1: float = 0.5, b2: float = 0.999):
        super().__init__(datamodule)
        self.save_hyperparameters(latent_dim=latent_dim, hidden_dim=hidden_dim,
                                  loss_mode=loss_mode, lrG=lrG, lrD=lrD,
                                  b1=b1, b2=b2)
        self.modules = ModuleDict(
            decoder=instantiate(decoder, input_channel=latent_dim,
                                output_channel=self.channels),
            encoder=instantiate(encoder, input_channel=self.channels,
                                output_channel=latent_dim),
            discriminator=Discriminator(dict(encoder), self.channels,
                                        latent_dim, hidden_dim),
        )

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        self.optimizers = (
            OptimizerSet()
            .add("g", adam(hp.lrG, hp.b1, hp.b2), ["encoder", "decoder"])
            .add("d", adam(hp.lrD, hp.b1, hp.b2), ["discriminator"]))
        z0 = jnp.zeros((1, hp.latent_dim))
        return self.make_state(rng, {
            "decoder": (z0,),
            "encoder": (self.dummy_image_batch(1),),
            "discriminator": (self.dummy_image_batch(1), z0),
        })

    def train_step(self, state: TrainState, batch):
        imgs_raw, _ = batch
        state, z_rng = state.next_rng()
        imgs = self.preprocess(imgs_raw)
        hp = self.hparams
        mode = hp.loss_mode
        z = jax.random.normal(z_rng, (imgs.shape[0], hp.latent_dim))

        g_sub = {n: state.params[n] for n in ("encoder", "decoder")}
        d_sub = {"discriminator": state.params["discriminator"]}

        def f(pg, pd):
            params = {**state.params, **pg, **pd}
            enc_z, mut_e = self.modules.apply("encoder", params,
                                              state.mutables, imgs)
            fake_x, mut_dec = self.modules.apply("decoder", params,
                                                 state.mutables, z)
            real_logit, mut_d = self.modules.apply(
                "discriminator", params, state.mutables, imgs, enc_z)
            mut1 = {**state.mutables, "discriminator": mut_d}
            fake_logit, mut_d2 = self.modules.apply(
                "discriminator", params, mut1, fake_x, z)
            g_loss = (adversarial_loss(real_logit, False, mode)
                      + adversarial_loss(fake_logit, True, mode))
            d_loss = (adversarial_loss(real_logit, True, mode)
                      + adversarial_loss(fake_logit, False, mode))
            metrics = {
                "train_loss/g_loss": g_loss, "train_loss/d_loss": d_loss,
                "train_log/real_logit": real_logit.mean(),
                "train_log/fake_logit": fake_logit.mean()}
            mutables = {**state.mutables, "encoder": mut_e,
                        "decoder": mut_dec, "discriminator": mut_d2}
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
        enc_z, _ = self.modules.apply("encoder", state.params, state.mutables,
                                      imgs, train=False)
        recon, _ = self.modules.apply("decoder", state.params, state.mutables,
                                      enc_z, train=False)
        recon = recon.reshape(imgs.shape)
        return {"real_image": imgs, "fake_image": fake, "recon_image": recon,
                "encode_latent": enc_z}, {}
