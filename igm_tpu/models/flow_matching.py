"""Rectified flow / conditional flow matching (beyond parity).

The reference zoo (SURVEY.md §2) covers GANs, VAEs, autoregressive and
DDPM diffusion; flow matching (Lipman et al. 2023, "Flow Matching for
Generative Modeling"; Liu et al. 2023 rectified flow) is the modern
continuous-time sibling of DDPM and reuses the same UNet backbone
(src/models/ddpm.py:170-261 parity net) with a velocity- instead of a
noise-prediction head semantics:

    x_t = (1 - (1 - sigma_min) * t) * x0 + t * x1,   x0 ~ N(0, I), x1 = data
    v*(x_t, t) = x1 - (1 - sigma_min) * x0
    loss = || v_theta(x_t, t) - v* ||^2

Sampling integrates the ODE dx/dt = v_theta(x, t) from t=0 (noise) to
t=1 (data) with a fixed-step Euler or Heun scan — 20-80 UNet evals vs
DDPM's 1000-step ancestral chain, all inside one ``lax.scan`` program.

Class-conditioning + classifier-free guidance follow the exact
conditional-DDPM pattern (models/ddpm.py): a label-embedding row
``num_classes`` is the trained null token; guidance runs both branches
as one doubled batch.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam
from ..core.state import TrainState, bump
from .base import BaseModel
from .ddpm import build_denoiser

# UNet's SinusoidalPosEmb frequencies are laid out for t in [0, ~1000)
# (DDPM timestep range); flow-matching time lives in [0, 1] so it is
# scaled onto the same range before entering the embedding.
TIME_SCALE = 999.0


class FlowMatching(BaseModel):
    def __init__(self, datamodule: Any, hidden_dim: int = 64,
                 dim_mults: Sequence[int] = (1, 2, 4), lr: float = 2e-4,
                 b1: float = 0.9, b2: float = 0.999,
                 sigma_min: float = 0.0, sample_steps: int = 50,
                 sampler: str = "heun", sample_batch: int = 64,
                 compute_dtype: str = "auto", remat: bool = False,
                 ema_decay: float = 0.0,
                 num_classes: int | None = 0, cond_drop_prob: float = 0.1,
                 guidance_scale: float = 2.0, network: str = "unet",
                 depth: int = 8, heads: int = 6, patch: int = 2, **kwargs):
        super().__init__(datamodule)
        self.num_classes = int(num_classes or 0)
        self.save_hyperparameters(
            hidden_dim=hidden_dim, dim_mults=list(dim_mults), lr=lr, b1=b1,
            b2=b2, sigma_min=sigma_min, sample_steps=sample_steps,
            sampler=sampler, sample_batch=sample_batch, ema_decay=ema_decay,
            num_classes=self.num_classes, cond_drop_prob=cond_drop_prob,
            guidance_scale=guidance_scale, network=network, depth=depth,
            heads=heads, patch=patch)
        if sampler not in ("euler", "heun"):
            raise ValueError(f"sampler must be euler|heun, got {sampler!r}")
        if compute_dtype == "auto":
            compute_dtype = ("bfloat16" if jax.default_backend() == "tpu"
                             else "float32")
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
        self.modules = ModuleDict(
            velocity=build_denoiser(network, hidden_dim=hidden_dim,
                                    channels=self.channels,
                                    dim_mults=dim_mults, dtype=dtype,
                                    num_classes=self.num_classes,
                                    remat=bool(remat), depth=depth,
                                    heads=heads, patch=patch))

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        self.optimizers = OptimizerSet().add(
            "opt", adam(hp.lr, hp.b1, hp.b2), ["velocity"])
        dummy = (self.dummy_image_batch(1), jnp.zeros((1,)))
        if self.num_classes:
            dummy = dummy + (jnp.zeros((1,), jnp.int32),)
        state = self.make_state(rng, {"velocity": dummy})
        if hp.ema_decay > 0:
            state = state.replace(opt_states={
                **state.opt_states, "ema": state.params["velocity"]})
        return state

    # ------------------------------------------------------------------ train
    def train_step(self, state: TrainState, batch):
        imgs_raw, labels = batch
        n_keys = 3 if self.num_classes else 2
        state, rngs = state.next_rng(n_keys)
        t_rng, noise_rng = rngs[0], rngs[1]
        x1 = self.preprocess(imgs_raw)
        n = x1.shape[0]
        sm = float(self.hparams.sigma_min)
        t = jax.random.uniform(t_rng, (n,))
        x0 = jax.random.normal(noise_rng, x1.shape)
        tb = t.reshape(-1, *([1] * (x1.ndim - 1)))
        x_t = (1.0 - (1.0 - sm) * tb) * x0 + tb * x1
        target = x1 - (1.0 - sm) * x0
        if self.num_classes:
            drop = jax.random.bernoulli(
                rngs[2], float(self.hparams.cond_drop_prob), (n,))
            y = (jnp.where(drop, self.num_classes,
                           labels.astype(jnp.int32)),)
        else:
            y = ()

        def loss_fn(params):
            pred, mut = self.modules.apply("velocity", params, state.mutables,
                                           x_t, t * TIME_SCALE, *y)
            loss = jnp.mean((target - pred) ** 2)
            return loss, {"metrics": {"train_loss/loss": loss},
                          "mutables": {**state.mutables, "velocity": mut}}

        state, _, aux = self.optimizers.grad_step(state, "opt", loss_fn)
        if self.hparams.ema_decay > 0:
            d = self.hparams.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p,
                state.opt_states["ema"], state.params["velocity"])
            state = state.replace(opt_states={**state.opt_states, "ema": ema})
        return bump(state), aux["metrics"]

    # --------------------------------------------------------------- sampling
    def _velocity(self, state, x, t, y=None, guidance: float = 1.0):
        params = state.params
        if self.hparams.ema_decay > 0 and "ema" in state.opt_states:
            params = {**params, "velocity": state.opt_states["ema"]}
        tb = jnp.full((x.shape[0],), t * TIME_SCALE, jnp.float32) \
            if jnp.ndim(t) == 0 else t * TIME_SCALE

        def net(xx, tt, yy):
            args = (xx, tt) if yy is None else (xx, tt, yy)
            out, _ = self.modules.apply("velocity", params, state.mutables,
                                        *args, train=False)
            return out

        if self.num_classes == 0:
            return net(x, tb, None)
        if y is None:
            y = jnp.full((x.shape[0],), self.num_classes, jnp.int32)
        if guidance == 1.0:
            return net(x, tb, y)
        # CFG as one doubled batch (single MXU-friendly dispatch per step)
        null = jnp.full_like(y, self.num_classes)
        v2 = net(jnp.concatenate([x, x]), jnp.concatenate([tb, tb]),
                 jnp.concatenate([y, null]))
        v_y, v_null = jnp.split(v2, 2)
        return v_null + guidance * (v_y - v_null)

    def _default_labels(self, n: int) -> jnp.ndarray:
        return (jnp.arange(n) * self.num_classes // n).astype(jnp.int32)

    def ode_sample(self, state: TrainState, rng: jax.Array, n: int,
                   steps: int | None = None, y=None,
                   guidance: float = 1.0) -> jnp.ndarray:
        steps = int(self.hparams.sample_steps) if steps is None else steps
        shape = (n, self.height, self.width, self.channels)
        x = jax.random.normal(rng, shape)
        dt = 1.0 / steps
        heun = self.hparams.sampler == "heun"

        def step(x, i):
            t = i.astype(jnp.float32) * dt
            v = self._velocity(state, x, t, y, guidance)
            if heun:
                # Heun / explicit trapezoid: average the slope at both ends.
                # The final sub-step evaluates at exactly t=1.
                v2 = self._velocity(state, x + dt * v, t + dt, y, guidance)
                v = 0.5 * (v + v2)
            return x + dt * v, None

        x, _ = jax.lax.scan(step, x, jnp.arange(steps))
        return x

    def sample(self, state: TrainState, rng: jax.Array, n: int,
               y=None) -> jnp.ndarray:
        guidance = 1.0
        if self.num_classes:
            if y is None:
                y = self._default_labels(n)
            guidance = float(self.hparams.guidance_scale)
        return jnp.clip(self.ode_sample(state, rng, n, y=y,
                                        guidance=guidance), -1.0, 1.0)

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, _ = batch
        imgs = self.preprocess(imgs_raw)
        result = {"real_image": imgs}
        if sample:
            result["fake_image"] = self.sample(
                state, rng, int(self.hparams.sample_batch))
        return result, {}
