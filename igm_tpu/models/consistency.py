r"""Consistency models — one/two-step generation via consistency training
(Song et al. 2023 "Consistency Models"; improved recipe from Song &
Dhariwal 2023 "Improved Techniques for Training Consistency Models",
"iCT") — beyond parity.

The reference zoo's diffusion sampler is the 1000-eval ancestral chain
(`/root/reference/src/models/ddpm.py:68-101`); this framework already
carries DDIM / DPM-Solver++ / EDM-Heun fast ODE samplers (20-50 network
evals).  Consistency training is the logical endpoint of that ladder:
the network learns the ODE's *solution map* f(x_sigma, sigma) -> x_0
directly, so sampling is ONE forward pass (two for the multistep
refinement), i.e. the sampler throughput equals raw denoiser-forward
throughput on the MXU.

Training (iCT recipe, adapted to static shapes under jit):
    grid   sigma_0 < ... < sigma_{N-1}   (ascending Karras grid, fixed N —
           iCT's doubling curriculum is dropped because a step-dependent
           grid size would be a dynamic shape inside the jitted train
           step; a fixed fine grid is the curriculum's end state)
    i ~ p(i) \propto erf((ln s_{i+1} - Pm)/(sqrt2 Ps))
                  - erf((ln s_i    - Pm)/(sqrt2 Ps))     (lognormal, iCT §3.5)
    x_hi = x + sigma_{i+1} z,  x_lo = x + sigma_i z      (same z — the
           unbiased score-estimator trick that removes the teacher model)
    loss = E[ lambda_i * d( f_theta(x_hi, s_{i+1}), f_(theta-)(x_lo, s_i) ) ]
    lambda_i = 1/(s_{i+1}-s_i);  d = pseudo-Huber sqrt(||.||^2 + c^2)-c,
    c = 0.00054*sqrt(D) (iCT §3.3);  theta- = stop_gradient(theta)
    (iCT found EMA-teacher decay 0, i.e. plain stopgrad, optimal).

Parameterization: EDM preconditioning with the boundary condition
anchored at sigma_min so f(x, sigma_min) == x EXACTLY (paper eq. 5):
    c_skip = sd^2 / ((sigma-sigma_min)^2 + sd^2)
    c_out  = sd*(sigma-sigma_min) / sqrt(sigma^2 + sd^2)
c_in / c_noise are EDM's (shared time-embedding mapping, models/edm.py).

Sampling (paper Algorithm 1, multistep): x ~ N(0, sigma_max^2 I);
f = f(x, sigma_max); then for each refinement sigma t_k (descending):
x <- f + sqrt(t_k^2 - sigma_min^2) z_k;  f <- f(x, t_k).  One
``lax.scan`` over the refinement steps; ``sample_steps=1`` is pure
single-eval generation.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# host-side, trace-time constants only — stdlib erf keeps scipy out of the
# runtime dependency set (it is a test-only extra in pyproject.toml)
_erf = np.vectorize(math.erf, otypes=[np.float64])

from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam
from ..core.state import TrainState, bump
from .base import BaseModel
from .ddpm import build_denoiser
from .edm import _c_in, _c_noise, karras_sigmas


def _c_skip_b(sigma, sd, smin):
    return sd ** 2 / ((sigma - smin) ** 2 + sd ** 2)


def _c_out_b(sigma, sd, smin):
    return sd * (sigma - smin) / jnp.sqrt(sigma ** 2 + sd ** 2)


def lognormal_index_weights(sigmas: np.ndarray, p_mean: float,
                            p_std: float) -> np.ndarray:
    """iCT eq. 13: discrete lognormal weights over adjacent grid pairs
    (len == len(sigmas)-1); numpy at trace time — a jit constant."""
    z = (np.log(sigmas) - p_mean) / (np.sqrt(2.0) * p_std)
    w = _erf(z[1:]) - _erf(z[:-1])
    return (w / w.sum()).astype(np.float32)


class ConsistencyModel(BaseModel):
    def __init__(self, datamodule: Any, hidden_dim: int = 64,
                 dim_mults: Sequence[int] = (1, 2, 4), lr: float = 1e-4,
                 b1: float = 0.9, b2: float = 0.995,
                 sigma_data: float = 0.5, sigma_min: float = 0.002,
                 sigma_max: float = 80.0, rho: float = 7.0,
                 n_grid: int = 64, p_mean: float = -1.1, p_std: float = 2.0,
                 sample_steps: int = 2, sample_batch: int = 64,
                 compute_dtype: str = "auto", remat: bool = False,
                 ema_decay: float = 0.9995,
                 num_classes: int | None = 0,
                 network: str = "unet", depth: int = 8, heads: int = 6,
                 patch: int = 2, attention: str = "auto", **kwargs):
        super().__init__(datamodule)
        self.num_classes = int(num_classes or 0)
        self.save_hyperparameters(
            hidden_dim=hidden_dim, dim_mults=list(dim_mults), lr=lr, b1=b1,
            b2=b2, sigma_data=sigma_data, sigma_min=sigma_min,
            sigma_max=sigma_max, rho=rho, n_grid=n_grid, p_mean=p_mean,
            p_std=p_std, sample_steps=sample_steps,
            sample_batch=sample_batch, ema_decay=ema_decay,
            num_classes=self.num_classes, network=network, depth=depth,
            heads=heads, patch=patch)
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

    # ascending grid sigma_min..sigma_max (karras_sigmas is descending
    # with a terminal 0 appended — strip it and flip)
    def _grid(self) -> np.ndarray:
        hp = self.hparams
        return karras_sigmas(int(hp.n_grid), float(hp.sigma_min),
                             float(hp.sigma_max), float(hp.rho))[:-1][::-1]

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

    # ------------------------------------------------------------ f(x, sigma)
    def _apply_F(self, params, mutables, x_in, c_noise, y, train):
        args = (x_in, c_noise) if y is None else (x_in, c_noise, y)
        return self.modules.apply("denoise", params, mutables, *args,
                                  train=train)

    def _f(self, params, mutables, x, sigma, y, train):
        """Boundary-anchored consistency function; ``sigma`` is (N,)."""
        hp = self.hparams
        sd, smin = float(hp.sigma_data), float(hp.sigma_min)
        sb = sigma.reshape(-1, *([1] * (x.ndim - 1)))
        out, mut = self._apply_F(params, mutables, _c_in(sb, sd) * x,
                                 _c_noise(sigma), y, train=train)
        f = _c_skip_b(sb, sd, smin) * x \
            + _c_out_b(sb, sd, smin) * out.astype(x.dtype)
        return f, mut

    def _f_ema(self, state: TrainState, x, sigma, y=None):
        params = state.params
        if self.hparams.ema_decay > 0 and "ema" in state.opt_states:
            params = {**params, "denoise": state.opt_states["ema"]}
        f, _ = self._f(params, state.mutables, x, sigma, y, train=False)
        return f

    # ------------------------------------------------------------------ train
    def train_step(self, state: TrainState, batch):
        imgs_raw, labels = batch
        state, rngs = state.next_rng(2)
        i_rng, z_rng = rngs[0], rngs[1]
        x = self.preprocess(imgs_raw)
        n = x.shape[0]
        hp = self.hparams

        grid = self._grid()
        sigmas = jnp.asarray(grid.copy())
        logp = jnp.asarray(np.log(lognormal_index_weights(
            grid, float(hp.p_mean), float(hp.p_std))))
        i = jax.random.categorical(i_rng, logp, shape=(n,))
        s_lo, s_hi = sigmas[i], sigmas[i + 1]
        z = jax.random.normal(z_rng, x.shape)
        bshape = (-1, *([1] * (x.ndim - 1)))
        x_lo = x + s_lo.reshape(bshape) * z
        x_hi = x + s_hi.reshape(bshape) * z
        lam = 1.0 / (s_hi - s_lo)
        # iCT §3.3: c = 0.00054 * sqrt(D), D = data dimensionality
        dim = float(np.prod(x.shape[1:]))
        hub_c = 0.00054 * np.sqrt(dim)
        y = labels.astype(jnp.int32) if self.num_classes else None

        def loss_fn(params):
            f_hi, mut = self._f(params, state.mutables, x_hi, s_hi, y,
                                train=True)
            f_lo, _ = self._f(jax.lax.stop_gradient(params), state.mutables,
                              x_lo, s_lo, y, train=False)
            f_lo = jax.lax.stop_gradient(f_lo)
            sq = jnp.sum((f_hi - f_lo) ** 2, axis=tuple(range(1, x.ndim)))
            d = jnp.sqrt(sq + hub_c ** 2) - hub_c
            loss = jnp.mean(lam * d)
            return loss, {"metrics": {"train_loss/loss": loss,
                                      "train_loss/raw_l2": jnp.mean(sq)},
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

    def multistep_sample(self, state: TrainState, rng: jax.Array, n: int,
                         steps: int | None = None, y=None) -> jnp.ndarray:
        """Algorithm 1 (multistep consistency sampling): 1 eval at
        sigma_max + (steps-1) refinement evals at descending grid sigmas;
        refinements run as one ``lax.scan``."""
        hp = self.hparams
        steps = int(hp.sample_steps) if steps is None else int(steps)
        smin, smax = float(hp.sigma_min), float(hp.sigma_max)
        shape = (n, self.height, self.width, self.channels)
        rng, r0 = jax.random.split(rng)
        x = jax.random.normal(r0, shape) * smax
        f = self._f_ema(state, x, jnp.full((n,), smax), y)
        if steps <= 1:
            return f
        # refinement sigmas: evenly spaced (in grid index) strictly
        # between sigma_max and sigma_min, descending
        grid = self._grid()[::-1]  # descending smax..smin
        idx = np.linspace(0, len(grid) - 1, steps + 1).round().astype(int)
        # rounding can collide when steps approaches n_grid — dedupe so the
        # refinement schedule stays strictly decreasing (no wasted NFE)
        t_ks = grid[np.unique(idx[1:-1])]  # exclude smax (done), smin (id.)
        keys = jax.random.split(rng, len(t_ks))

        def refine(f, inp):
            t_k, key = inp
            z = jax.random.normal(key, shape)
            x_k = f + jnp.sqrt(jnp.maximum(t_k ** 2 - smin ** 2, 0.0)) * z
            f = self._f_ema(state, x_k, jnp.full((n,), t_k), y)
            return f, None

        f, _ = jax.lax.scan(refine, f, (jnp.asarray(t_ks.copy()), keys))
        return f

    def sample(self, state: TrainState, rng: jax.Array, n: int,
               y=None) -> jnp.ndarray:
        if self.num_classes and y is None:
            y = self._default_labels(n)
        return jnp.clip(self.multistep_sample(state, rng, n, y=y),
                        -1.0, 1.0)

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, _ = batch
        imgs = self.preprocess(imgs_raw)
        result = {"real_image": imgs}
        if sample:
            result["fake_image"] = self.sample(
                state, rng, int(self.hparams.sample_batch))
        return result, {}
