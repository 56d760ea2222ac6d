"""InfoGAN (parity: src/models/info_gan.py).

Latent = one-hot discrete (dim x value) + continuous + noise
(`info_gan.py:33`); shared common_layer feeding adversarial head netD and
posterior head netQ (`info_gan.py:35-43`).  G step maximises adversarial
realness + lambda_I * (CE discrete + MSE continuous) mutual information
(`info_gan.py:109-118`); the G optimizer covers netG AND netQ with separate
learning rates (torch param groups -> optax.multi_transform).  Alternates
G/D per step (the reference uses PL1.x optimizer_idx alternation).
Traversal grids are rendered in on_train_epoch_end (`info_gan.py:135-169`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import instantiate
from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam, grouped_adam
from ..core.state import TrainState, bump
from ..networks.base import Dense
from ..utils.losses import adversarial_loss
from .base import BaseModel

NAN = jnp.nan


class _AdvHead(nn.Module):
    """LeakyReLU -> Linear(1) (`info_gan.py:38`)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        return Dense(1)(nn.leaky_relu(x, 0.01))


class _QHead(nn.Module):
    """LeakyReLU -> 128 -> LeakyReLU -> dis*val + cont (`info_gan.py:39-43`)."""
    out_dim: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.leaky_relu(x, 0.01)
        x = Dense(128)(x)
        x = nn.leaky_relu(x, 0.01)
        return Dense(self.out_dim)(x)


class InfoGAN(BaseModel):
    def __init__(self, datamodule: Any, netG: Any, netD: Any,
                 lambda_I: float = 1, discrete_dim: int = 1,
                 discrete_value: int = 10, continuous_dim: int = 2,
                 noise_dim: int = 62, encode_dim: int = 1024,
                 loss_mode: str = "vanilla", lrG: float = 1e-3,
                 lrD: float = 2e-4, lrQ: float = 2e-4, b1: float = 0.5,
                 b2: float = 0.999):
        super().__init__(datamodule)
        self.save_hyperparameters(
            lambda_I=lambda_I, discrete_dim=discrete_dim,
            discrete_value=discrete_value, continuous_dim=continuous_dim,
            noise_dim=noise_dim, encode_dim=encode_dim, loss_mode=loss_mode,
            lrG=lrG, lrD=lrD, lrQ=lrQ, b1=b1, b2=b2,
            latent_dim=discrete_dim * discrete_value + continuous_dim + noise_dim)
        self.latent_dim = self.hparams.latent_dim
        self.decoder_module_name = "netG"
        self.modules = ModuleDict(
            netG=instantiate(netG, input_channel=self.latent_dim,
                             output_channel=self.channels),
            common=instantiate(netD, input_channel=self.channels,
                               output_channel=encode_dim),
            netD=_AdvHead(),
            netQ=_QHead(discrete_dim * discrete_value + continuous_dim),
        )

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        self.optimizers = (
            OptimizerSet()
            .add("g", grouped_adam({"netG": hp.lrG, "netQ": hp.lrQ},
                                   hp.b1, hp.b2), ["netG", "netQ"])
            .add("d", adam(hp.lrD, hp.b1, hp.b2), ["netD", "common"]))
        feat = jnp.zeros((1, hp.encode_dim))
        return self.make_state(rng, {
            "netG": (jnp.zeros((1, self.latent_dim)),),
            "common": (self.dummy_image_batch(),),
            "netD": (feat,),
            "netQ": (feat,),
        })

    # --------------------------------------------------------------- latents
    def _make_latent(self, rng, n, dis_c_index=None, cont_c=None, z=None):
        hp = self.hparams
        r1, r2, r3 = jax.random.split(rng, 3)
        if dis_c_index is None:
            dis_c_index = jax.random.randint(
                r1, (n, hp.discrete_dim), 0, hp.discrete_value)
        dis_c = jax.nn.one_hot(dis_c_index, hp.discrete_value,
                               axis=1)  # (N, value, dim)
        if cont_c is None:
            cont_c = jax.random.uniform(r2, (n, hp.continuous_dim),
                                        minval=-1.0, maxval=1.0)
        if z is None:
            z = jax.random.normal(r3, (n, hp.noise_dim))
        latent = jnp.concatenate([dis_c.reshape(n, -1), cont_c, z], axis=1)
        return latent, (dis_c_index, cont_c, z)

    def decode(self, state, rng, n, dis_c_index=None, cont_c=None, z=None):
        latent, _ = self._make_latent(rng, n, dis_c_index, cont_c, z)
        return self.forward(state, latent)

    def _encode(self, params, mutables, x, train: bool):
        feat, mut_c = self.modules.apply("common", params, mutables, x,
                                         train=train)
        adv_logit, _ = self.modules.apply("netD", params, mutables, feat,
                                          train=train)
        q_out, _ = self.modules.apply("netQ", params, mutables, feat,
                                      train=train)
        return adv_logit, q_out, mut_c

    # ------------------------------------------------------------------ steps
    def train_step(self, state: TrainState, batch):
        """BOTH optimizers step every batch (PL1.x optimizer_idx semantics,
        `info_gan.py:99` — the reference's intent; under its pinned PL2 the
        optimizer_idx signature no longer runs at all, SURVEY.md §8)."""
        imgs_raw, _ = batch
        state, rng = state.next_rng()
        imgs = self.preprocess(imgs_raw)
        n = imgs.shape[0]
        hp = self.hparams
        mode = hp.loss_mode

        def g_phase(state: TrainState):
            def loss_fn(params):
                latent, (dis_idx, cont_c, _z) = self._make_latent(rng, n)
                fake, mut_g = self.modules.apply("netG", params,
                                                 state.mutables, latent)
                adv_logit, q_out, mut_c = self._encode(params, state.mutables,
                                                       fake, train=True)
                g_loss = adversarial_loss(adv_logit, True, mode)
                dis_logits = q_out[:, :-hp.continuous_dim].reshape(
                    n, hp.discrete_value, hp.discrete_dim)
                cont_hat = q_out[:, -hp.continuous_dim:]
                log_probs = jax.nn.log_softmax(dis_logits, axis=1)
                i_disc = -jnp.take_along_axis(
                    log_probs, dis_idx[:, None, :], axis=1).mean() * 1.0
                i_cont = jnp.mean((cont_hat - cont_c) ** 2)
                total = g_loss + hp.lambda_I * (i_disc + i_cont)
                metrics = {"train_loss/g_loss": g_loss,
                           "train_loss/I_discrete_loss": i_disc,
                           "train_loss/I_continuous": i_cont}
                return total, {"metrics": metrics,
                               "mutables": {**state.mutables, "netG": mut_g,
                                            "common": mut_c}}

            state2, _, aux = self.optimizers.grad_step(state, "g", loss_fn)
            return state2, aux["metrics"]

        def d_phase(state: TrainState):
            def loss_fn(params):
                feat_r, mut_c = self.modules.apply("common", params,
                                                   state.mutables, imgs)
                pred_real, _ = self.modules.apply("netD", params,
                                                  state.mutables, feat_r)
                real_loss = adversarial_loss(pred_real, True, mode)
                latent, _ = self._make_latent(rng, n)
                fake, mut_g = self.modules.apply("netG", params,
                                                 state.mutables, latent)
                fake = jax.lax.stop_gradient(fake)
                mut1 = {**state.mutables, "common": mut_c}
                feat_f, mut_c2 = self.modules.apply("common", params, mut1,
                                                    fake)
                pred_fake, _ = self.modules.apply("netD", params,
                                                  state.mutables, feat_f)
                fake_loss = adversarial_loss(pred_fake, False, mode)
                d_loss = (real_loss + fake_loss) / 2.0
                metrics = {"train_loss/d_loss": d_loss,
                           "train_log/pred_real": pred_real.mean(),
                           "train_log/pred_fake": pred_fake.mean()}
                return d_loss, {"metrics": metrics,
                                "mutables": {**state.mutables, "netG": mut_g,
                                             "common": mut_c2}}

            state2, _, aux = self.optimizers.grad_step(state, "d", loss_fn)
            return state2, aux["metrics"]

        state, g_metrics = g_phase(state)
        state, d_metrics = d_phase(state)
        return bump(state), {**g_metrics, **d_metrics}

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, _ = batch
        imgs = self.preprocess(imgs_raw)
        fake = self.decode(state, rng, imgs.shape[0])
        return {"real_image": imgs, "fake_image": fake}, {}

    # ----------------------------------------------------------- epoch hook
    def on_train_epoch_end(self, trainer) -> None:
        """Traversal grids over discrete/continuous latents (info_gan.py:135)."""
        from ..callbacks.visualization import get_grid_images
        state = trainer.state
        if state is None:
            return
        hp = self.hparams
        rng = jax.random.PRNGKey(trainer.current_epoch)
        logger = trainer.logger
        epoch = trainer.current_epoch

        imgs = self.decode(state, rng, 64)
        logger.log_image("images/sample",
                         get_grid_images(np.asarray(imgs), self, 64, 8), epoch)

        n_rows, a, b, c = 8, hp.discrete_value, hp.continuous_dim, hp.noise_dim
        r1, r2, r3 = jax.random.split(rng, 3)
        disc = jnp.tile(jnp.arange(a).reshape(1, a), (n_rows, 1)).reshape(-1, 1)
        cont = jnp.tile(jax.random.normal(r1, (n_rows, 1, b)), (1, a, 1)).reshape(-1, b)
        z = jnp.tile(jax.random.normal(r2, (n_rows, 1, c)), (1, a, 1)).reshape(-1, c)
        imgs = self.decode(state, rng, n_rows * a, disc, cont, z)
        logger.log_image("visual/traverse over discrete values",
                         get_grid_images(np.asarray(imgs), self, n_rows * a, a),
                         epoch)

        col = 10
        disc = jnp.tile(jax.random.randint(r3, (n_rows, 1), 0, a),
                        (1, col)).reshape(-1, 1)
        variation = jnp.tile(jnp.linspace(-2, 2, col).reshape(1, col),
                             (n_rows, 1)).reshape(-1)
        cont = jnp.tile(jax.random.normal(r1, (n_rows, 1, b)),
                        (1, col, 1)).reshape(-1, b)
        z = jnp.tile(jax.random.normal(r2, (n_rows, 1, c)),
                     (1, col, 1)).reshape(-1, c)
        for i, tag in zip(range(min(2, b)),
                          ("visual/traverse over first continuous values",
                           "visual/traverse over second continuous values")):
            cont_mix = cont.at[:, i].set(variation)
            imgs = self.decode(state, rng, n_rows * col, disc, cont_mix, z)
            logger.log_image(tag,
                             get_grid_images(np.asarray(imgs), self,
                                             n_rows * col, col), epoch)
