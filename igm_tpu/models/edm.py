"""EDM — "Elucidating the Design Space of Diffusion-Based Generative
Models" (Karras et al. 2022) — beyond parity.

The reference zoo's only diffusion model is the discrete-time DDPM
(`/root/reference/src/models/ddpm.py`).  EDM is its modern sigma-space
reformulation and the strongest known training recipe for this model
class; it completes the framework's diffusion lineup (DDPM -> latent /
conditional DDPM -> flow matching -> EDM) while reusing the same backbone
factory (``models/ddpm.py::build_denoiser`` — conv UNet or DiT).

Training (paper Table 1, VP-agnostic "EDM" column):
    sigma ~ LogNormal(P_mean, P_std)
    x_sigma = x + sigma * n,  n ~ N(0, I)
    D(x; sigma) = c_skip(sigma) x + c_out(sigma) F(c_in(sigma) x, c_noise)
    loss = E[ lambda(sigma) * || D(x_sigma; sigma) - x ||^2 ],
    lambda = (sigma^2 + sigma_data^2) / (sigma * sigma_data)^2 = 1/c_out^2

so every sigma contributes a unit-variance target in F-space — the same
conditioning argument Min-SNR approximates for eps-models.

Sampling: deterministic 2nd-order Heun over the Karras sigma grid
(paper Algorithm 1, churn-free), as ONE ``lax.scan`` device program like
every other sampler in the framework; 18-50 network evals vs the
ancestral chain's 1000.

Class-conditioning + classifier-free guidance follow the conditional-DDPM
pattern exactly (label dropout to a trained null token; CFG as one
doubled batch).  D is linear in the network output, so guidance combines
identically in D-space.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam
from ..core.state import TrainState, bump
from .base import BaseModel
from .ddpm import build_denoiser

# The shared backbones embed "time" with SinusoidalPosEmb laid out for
# t in [0, 1000) (DDPM's range).  EDM's canonical noise conditioning is
# c_noise = ln(sigma)/4 in [-1.6, 1.1] over the default sigma range —
# far too narrow for those frequencies — so it is affinely mapped onto
# the embedding's native range (monotone in sigma, well spread):
#     t_emb = (ln(sigma)/4 + 2) * 250
_CN_SHIFT, _CN_SCALE = 2.0, 250.0


def _c_skip(sigma, sd):
    return sd ** 2 / (sigma ** 2 + sd ** 2)


def _c_out(sigma, sd):
    return sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)


def _c_in(sigma, sd):
    return 1.0 / jnp.sqrt(sigma ** 2 + sd ** 2)


def _c_noise(sigma):
    return (jnp.log(sigma) / 4.0 + _CN_SHIFT) * _CN_SCALE


def karras_sigmas(steps: int, sigma_min: float, sigma_max: float,
                  rho: float) -> np.ndarray:
    """Descending Karras sigma grid with the terminal 0 appended
    (paper eq. 5); numpy at trace time — a scan constant."""
    i = np.linspace(0.0, 1.0, steps)
    grid = (sigma_max ** (1 / rho)
            + i * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho
    return np.append(grid, 0.0).astype(np.float32)


class EDM(BaseModel):
    def __init__(self, datamodule: Any, hidden_dim: int = 64,
                 dim_mults: Sequence[int] = (1, 2, 4), lr: float = 2e-4,
                 b1: float = 0.9, b2: float = 0.999,
                 sigma_data: float = 0.5, p_mean: float = -1.2,
                 p_std: float = 1.2, sigma_min: float = 0.002,
                 sigma_max: float = 80.0, rho: float = 7.0,
                 sample_steps: int = 18, sample_batch: int = 64,
                 compute_dtype: str = "auto", remat: bool = False,
                 ema_decay: float = 0.0,
                 num_classes: int | None = 0, cond_drop_prob: float = 0.1,
                 guidance_scale: float = 2.0, network: str = "unet",
                 depth: int = 8, heads: int = 6, patch: int = 2,
                 attention: str = "auto", **kwargs):
        super().__init__(datamodule)
        self.num_classes = int(num_classes or 0)
        self.save_hyperparameters(
            hidden_dim=hidden_dim, dim_mults=list(dim_mults), lr=lr, b1=b1,
            b2=b2, sigma_data=sigma_data, p_mean=p_mean, p_std=p_std,
            sigma_min=sigma_min, sigma_max=sigma_max, rho=rho,
            sample_steps=sample_steps, sample_batch=sample_batch,
            ema_decay=ema_decay, num_classes=self.num_classes,
            cond_drop_prob=cond_drop_prob, guidance_scale=guidance_scale,
            network=network, depth=depth, heads=heads, patch=patch)
        if compute_dtype == "auto":
            compute_dtype = ("bfloat16" if jax.default_backend() == "tpu"
                             else "float32")
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
        self.modules = ModuleDict(
            denoise=build_denoiser(network, hidden_dim=hidden_dim,
                                   channels=self.channels,
                                   dim_mults=dim_mults, dtype=dtype,
                                   num_classes=self.num_classes,
                                   remat=bool(remat), depth=depth,
                                   heads=heads, patch=patch,
                                   attention=attention))

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        self.optimizers = OptimizerSet().add(
            "opt", adam(hp.lr, hp.b1, hp.b2), ["denoise"])
        dummy = (self.dummy_image_batch(1), jnp.zeros((1,)))
        if self.num_classes:
            dummy = dummy + (jnp.zeros((1,), jnp.int32),)
        state = self.make_state(rng, {"denoise": dummy})
        if hp.ema_decay > 0:
            state = state.replace(opt_states={
                **state.opt_states, "ema": state.params["denoise"]})
        return state

    # ------------------------------------------------------------ denoiser D
    def _apply_F(self, params, mutables, x_in, c_noise, y, train):
        args = (x_in, c_noise) if y is None else (x_in, c_noise, y)
        return self.modules.apply("denoise", params, mutables, *args,
                                  train=train)

    def _D(self, state, x, sigma, y=None, guidance: float = 1.0):
        """Preconditioned denoiser D(x; sigma) with optional CFG.

        ``sigma`` is a (N,) batch; D is linear in F, so guidance combines
        identically before or after preconditioning."""
        params = state.params
        if self.hparams.ema_decay > 0 and "ema" in state.opt_states:
            params = {**params, "denoise": state.opt_states["ema"]}
        sd = float(self.hparams.sigma_data)
        sb = sigma.reshape(-1, *([1] * (x.ndim - 1)))
        x_in = _c_in(sb, sd) * x
        cn = _c_noise(sigma)

        def F(xx, tt, yy):
            out, _ = self._apply_F(params, state.mutables, xx, tt, yy,
                                   train=False)
            return out

        if self.num_classes == 0 or y is None or guidance == 1.0:
            f = F(x_in, cn, y)
        else:
            null = jnp.full_like(y, self.num_classes)
            f2 = F(jnp.concatenate([x_in, x_in]),
                   jnp.concatenate([cn, cn]),
                   jnp.concatenate([y, null]))
            f_y, f_null = jnp.split(f2, 2)
            f = f_null + guidance * (f_y - f_null)
        return _c_skip(sb, sd) * x + _c_out(sb, sd) * f.astype(x.dtype)

    # ------------------------------------------------------------------ train
    def train_step(self, state: TrainState, batch):
        imgs_raw, labels = batch
        n_keys = 3 if self.num_classes else 2
        state, rngs = state.next_rng(n_keys)
        s_rng, noise_rng = rngs[0], rngs[1]
        x = self.preprocess(imgs_raw)
        n = x.shape[0]
        hp = self.hparams
        sd = float(hp.sigma_data)

        ln_sigma = (float(hp.p_mean)
                    + float(hp.p_std) * jax.random.normal(s_rng, (n,)))
        sigma = jnp.exp(ln_sigma)
        sb = sigma.reshape(-1, *([1] * (x.ndim - 1)))
        noise = jax.random.normal(noise_rng, x.shape)
        x_sigma = x + sb * noise
        lam = (sb ** 2 + sd ** 2) / (sb * sd) ** 2  # = 1 / c_out^2
        if self.num_classes:
            drop = jax.random.bernoulli(
                rngs[2], float(hp.cond_drop_prob), (n,))
            y = jnp.where(drop, self.num_classes, labels.astype(jnp.int32))
        else:
            y = None

        def loss_fn(params):
            f, mut = self._apply_F(params, state.mutables,
                                   _c_in(sb, sd) * x_sigma, _c_noise(sigma),
                                   y, train=True)
            d = _c_skip(sb, sd) * x_sigma + _c_out(sb, sd) * f.astype(x.dtype)
            loss = jnp.mean(lam * (d - x) ** 2)
            return loss, {"metrics": {"train_loss/loss": loss},
                          "mutables": {**state.mutables, "denoise": mut}}

        state, _, aux = self.optimizers.grad_step(state, "opt", loss_fn)
        if hp.ema_decay > 0:
            dd = hp.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: dd * e + (1.0 - dd) * p,
                state.opt_states["ema"], state.params["denoise"])
            state = state.replace(opt_states={**state.opt_states, "ema": ema})
        return bump(state), aux["metrics"]

    # --------------------------------------------------------------- sampling
    def _default_labels(self, n: int) -> jnp.ndarray:
        return (jnp.arange(n) * self.num_classes // n).astype(jnp.int32)

    def heun_sample(self, state: TrainState, rng: jax.Array, n: int,
                    steps: int | None = None, y=None,
                    guidance: float = 1.0) -> jnp.ndarray:
        """Deterministic Heun sampler over the Karras grid (Alg. 1,
        churn-free) — one ``lax.scan``; the final (sigma -> 0) sub-step
        drops to first order (the standard rule; there is no slope at 0)."""
        hp = self.hparams
        steps = int(hp.sample_steps) if steps is None else int(steps)
        sigmas = jnp.asarray(karras_sigmas(
            steps, float(hp.sigma_min), float(hp.sigma_max), float(hp.rho)))
        shape = (n, self.height, self.width, self.channels)
        x = jax.random.normal(rng, shape) * sigmas[0]

        def step(x, ss):
            s_cur, s_next = ss
            sc = jnp.full((n,), s_cur)
            d = (x - self._D(state, x, sc, y, guidance)) / s_cur
            x_euler = x + (s_next - s_cur) * d
            snb = jnp.full((n,), s_next)
            d2 = (x_euler - self._D(state, x_euler, snb, y, guidance)) \
                / s_next
            return x + (s_next - s_cur) * 0.5 * (d + d2), None

        # Heun pairs stop at the last nonzero sigma; the terminal
        # (sigma -> 0) step drops to first order (standard rule), and the
        # Euler step to 0 is exactly x + (0 - s)(x - D)/s == D — one free
        # network eval instead of a wasted in-scan branch.
        x, _ = jax.lax.scan(step, x, (sigmas[:-2], sigmas[1:-1]))
        sc = jnp.full((n,), sigmas[-2])
        return self._D(state, x, sc, y, guidance)

    def sample(self, state: TrainState, rng: jax.Array, n: int,
               y=None) -> jnp.ndarray:
        guidance = 1.0
        if self.num_classes:
            if y is None:
                y = self._default_labels(n)
            guidance = float(self.hparams.guidance_scale)
        return jnp.clip(self.heun_sample(state, rng, n, y=y,
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
