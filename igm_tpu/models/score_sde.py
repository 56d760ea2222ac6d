"""Score-SDE (VE / VP / sub-VP) — "Score-Based Generative Modeling through
SDEs" (Song et al., ICLR 2021) — beyond parity.

The third canonical diffusion formulation, completing the framework's
lineage next to the discrete-time DDPM (reference parity,
`/root/reference/src/models/ddpm.py`) and the sigma-space EDM, with all
three of the paper's SDEs (``model.sde=ve|vp|subvp``): the data is
perturbed by the Variance-Exploding SDE ``dx = sqrt(d[sigma^2(t)]/dt) dw``
with ``sigma(t) = sigma_min (sigma_max/sigma_min)^t``, the
Variance-Preserving SDE ``dx = -beta(t)/2 x dt + sqrt(beta(t)) dw`` (the
continuous-time limit of DDPM's discrete chain — the kernel coefficients
match DDPM's sqrt(alpha-bar) ladder, tested), or the sub-VP SDE with
``g^2 = beta (1 - exp(-2B))``.  A time-conditional network learns the
score ``s_theta(x, sigma) ~= grad_x log p_sigma(x)``, and sampling
integrates the reverse SDE with the paper's Predictor-Corrector loop
(reverse-diffusion predictor + annealed Langevin corrector, Algorithms
2-4) — the one sampler family the zoo lacked (stochastic-correction
sampling vs DDPM's ancestral chain and EDM/flow-matching's deterministic
ODEs).

TPU-first shape of the implementation:

- training draws ``t ~ U(0,1)`` continuously (no discrete ladder) and uses
  denoising score matching with the standard ``lambda = sigma^2`` weight:
  the regression target is the unit-variance ``-z`` in network space
  (``s_theta = F/sigma``), so the loss is ``E||F + z||^2`` — same
  conditioning argument as EDM's 1/c_out^2 weighting;
- the PC sampler is ONE ``lax.scan`` over the geometric sigma grid, with
  the M Langevin corrector steps an inner ``lax.fori_loop`` — the whole
  (1 + M) * N-eval chain is a single device program;
- the corrector step size is the paper's SNR rule
  ``eps = 2 (r ||z|| / ||s||)^2`` with per-sample norms (Alg. 4 line 5),
  computed entirely on-device;
- noise conditioning reuses the backbones' DDPM-range time embedding via
  the same affine log-sigma map EDM uses (models/edm.py _c_noise) — one
  embedding convention across all three diffusion families.

Sampler equivalences tested in tests/test_score_sde.py: with the ORACLE
Gaussian score the PC chain reproduces the true marginal statistics, and
the probability-flow ODE sampler (``sampler="ode"``) lands on the
analytic solution.
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
from .edm import _c_noise


def ve_sigma_grid(steps: int, sigma_min: float, sigma_max: float) -> np.ndarray:
    """Descending geometric sigma grid sigma_max -> sigma_min (the VE
    ladder, paper App. C); numpy at trace time — a scan constant."""
    return np.geomspace(sigma_max, sigma_min, steps).astype(np.float32)


def vp_B(t, beta_min: float, beta_max: float):
    """``B(t) = int_0^t beta(s) ds`` for the linear VP/sub-VP schedule
    ``beta(t) = beta_min + t (beta_max - beta_min)`` (paper App. B/C).
    Works on numpy or jnp arrays (trace-time grids AND jitted train_step)."""
    return beta_min * t + 0.5 * (beta_max - beta_min) * t * t


class ScoreSDE(BaseModel):
    def __init__(self, datamodule: Any, hidden_dim: int = 64,
                 dim_mults: Sequence[int] = (1, 2, 4), lr: float = 2e-4,
                 b1: float = 0.9, b2: float = 0.999,
                 sigma_min: float = 0.01, sigma_max: float = 50.0,
                 sample_steps: int = 64, corrector_steps: int = 1,
                 snr: float = 0.16, sampler: str = "pc", sde: str = "ve",
                 beta_min: float = 0.1, beta_max: float = 20.0,
                 t_eps: float = 1e-3,
                 sample_batch: int = 64, compute_dtype: str = "auto",
                 remat: bool = False, ema_decay: float = 0.0,
                 network: str = "unet", depth: int = 8, heads: int = 6,
                 patch: int = 2, attention: str = "auto", **kwargs):
        super().__init__(datamodule)
        if sampler not in ("pc", "ode"):
            raise ValueError(f"sampler must be pc|ode, got {sampler!r}")
        if sde not in ("ve", "vp", "subvp"):
            raise ValueError(f"sde must be ve|vp|subvp, got {sde!r}")
        self.save_hyperparameters(
            hidden_dim=hidden_dim, dim_mults=list(dim_mults), lr=lr, b1=b1,
            b2=b2, sigma_min=sigma_min, sigma_max=sigma_max,
            sample_steps=sample_steps, corrector_steps=corrector_steps,
            snr=snr, sampler=sampler, sde=sde, beta_min=beta_min,
            beta_max=beta_max, t_eps=t_eps, sample_batch=sample_batch,
            ema_decay=ema_decay, network=network, depth=depth, heads=heads,
            patch=patch)
        if compute_dtype == "auto":
            compute_dtype = ("bfloat16" if jax.default_backend() == "tpu"
                             else "float32")
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
        self.modules = ModuleDict(
            denoise=build_denoiser(network, hidden_dim=hidden_dim,
                                   channels=self.channels,
                                   dim_mults=dim_mults, dtype=dtype,
                                   num_classes=0, remat=bool(remat),
                                   depth=depth, heads=heads, patch=patch,
                                   attention=attention))

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        self.optimizers = OptimizerSet().add(
            "opt", adam(hp.lr, hp.b1, hp.b2), ["denoise"])
        dummy = (self.dummy_image_batch(1), jnp.zeros((1,)))
        state = self.make_state(rng, {"denoise": dummy})
        if hp.ema_decay > 0:
            state = state.replace(opt_states={
                **state.opt_states, "ema": state.params["denoise"]})
        return state

    def _sigma_of_t(self, t):
        lo = float(self.hparams.sigma_min)
        hi = float(self.hparams.sigma_max)
        return lo * (hi / lo) ** t

    def _kernel(self, t):
        """Perturbation-kernel coefficients ``x_t = m(t) x_0 + sigma(t) z``
        (paper eq. 29/33): VE m=1, sigma geometric; VP m=exp(-B/2),
        sigma=sqrt(1-exp(-B)); sub-VP same mean, sigma=1-exp(-B).
        numpy in, numpy out at trace time; jnp-safe in train_step."""
        hp = self.hparams
        if hp.sde == "ve":
            return (t * 0.0 + 1.0), self._sigma_of_t(t)
        B = vp_B(t, float(hp.beta_min), float(hp.beta_max))
        xp = jnp if isinstance(t, jnp.ndarray) else np
        m = xp.exp(-0.5 * B)
        sigma = (xp.sqrt(1.0 - xp.exp(-B)) if hp.sde == "vp"
                 else 1.0 - xp.exp(-B))
        return m, sigma

    def _beta(self, t):
        hp = self.hparams
        return float(hp.beta_min) + t * (float(hp.beta_max)
                                         - float(hp.beta_min))

    def _g2(self, t):
        """Squared diffusion coefficient g(t)^2 of the forward SDE: VP
        g^2=beta(t); sub-VP g^2=beta(t)(1-exp(-2B)) (paper eq. 28/32)."""
        hp = self.hparams
        if hp.sde == "vp":
            return self._beta(t)
        B = vp_B(t, float(hp.beta_min), float(hp.beta_max))
        xp = jnp if isinstance(t, jnp.ndarray) else np
        return self._beta(t) * (1.0 - xp.exp(-2.0 * B))

    # ------------------------------------------------------------- the score
    def score(self, state: TrainState, x, sigma, m: float = 1.0):
        """s_theta(x, sigma) ~= grad_x log p_sigma(x); sigma is (N,).

        The network F regresses -z (unit variance); the score of the
        perturbation kernel N(m x_0, sigma^2) is -z/sigma, so s = F/sigma.
        The network is conditioned on the SCALE-FREE noise level sigma/m
        (x_t/m = x_0 + (sigma/m) z) — for VE m=1 this is sigma itself, so
        one embedding convention covers all three SDEs."""
        params = state.params
        if self.hparams.ema_decay > 0 and "ema" in state.opt_states:
            params = {**params, "denoise": state.opt_states["ema"]}
        f, _ = self.modules.apply("denoise", params, state.mutables,
                                  x, _c_noise(sigma / m), train=False)
        sb = sigma.reshape(-1, *([1] * (x.ndim - 1)))
        return f.astype(x.dtype) / sb

    # ------------------------------------------------------------------ train
    def train_step(self, state: TrainState, batch):
        imgs_raw, _ = batch
        state, rngs = state.next_rng(2)
        t_rng, noise_rng = rngs[0], rngs[1]
        x = self.preprocess(imgs_raw)
        n = x.shape[0]

        hp0 = self.hparams
        if hp0.sde == "ve":
            t = jax.random.uniform(t_rng, (n,))
        else:
            # t_eps floor: sigma(t)->0 as t->0 makes the -z/sigma score
            # target blow up (paper's standard smallest-time cutoff)
            t = jax.random.uniform(t_rng, (n,), minval=float(hp0.t_eps),
                                   maxval=1.0)
        mean_c, sigma = self._kernel(t)
        bshape = (-1, *([1] * (x.ndim - 1)))
        sb = sigma.reshape(bshape)
        z = jax.random.normal(noise_rng, x.shape)
        x_t = jnp.reshape(mean_c, bshape) * x + sb * z

        def loss_fn(params):
            # sigma^2-weighted denoising score matching collapses to the
            # unit-variance regression || F + z ||^2 (F = sigma * s_theta)
            f, mut = self.modules.apply("denoise", params, state.mutables,
                                        x_t, _c_noise(sigma / mean_c),
                                        train=True)
            loss = jnp.mean((f.astype(x.dtype) + z) ** 2)
            return loss, {"metrics": {"train_loss/loss": loss},
                          "mutables": {**state.mutables, "denoise": mut}}

        state, _, aux = self.optimizers.grad_step(state, "opt", loss_fn)
        hp = self.hparams
        if hp.ema_decay > 0:
            dd = hp.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: dd * e + (1.0 - dd) * p,
                state.opt_states["ema"], state.params["denoise"])
            state = state.replace(opt_states={**state.opt_states, "ema": ema})
        return bump(state), aux["metrics"]

    # --------------------------------------------------------------- sampling
    def pc_sample(self, state: TrainState, rng: jax.Array, n: int,
                  steps: int | None = None,
                  corrector_steps: int | None = None) -> jnp.ndarray:
        """Predictor-Corrector reverse-SDE sampling (paper Alg. 2-4):
        reverse-diffusion predictor + ``M`` annealed-Langevin corrector
        steps per noise level, one ``lax.scan`` total."""
        hp = self.hparams
        steps = int(hp.sample_steps) if steps is None else int(steps)
        m_corr = (int(hp.corrector_steps) if corrector_steps is None
                  else int(corrector_steps))
        r = float(hp.snr)
        if hp.sde != "ve":
            return self._pc_sample_vp(state, rng, n, steps, m_corr, r)
        grid = jnp.asarray(ve_sigma_grid(
            steps, float(hp.sigma_min), float(hp.sigma_max)))
        shape = (n, self.height, self.width, self.channels)
        rng, init_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, shape) * grid[0]
        axes = tuple(range(1, len(shape)))

        def corrector(carry, _):
            x, key, sigma = carry
            key, zk = jax.random.split(key)
            s = self.score(state, x, jnp.full((n,), sigma))
            z = jax.random.normal(zk, x.shape)
            z_norm = jnp.sqrt(jnp.sum(z ** 2, axis=axes, keepdims=True))
            s_norm = jnp.sqrt(jnp.sum(s ** 2, axis=axes, keepdims=True))
            eps = 2.0 * (r * z_norm / jnp.maximum(s_norm, 1e-12)) ** 2
            x = x + eps * s + jnp.sqrt(2.0 * eps) * z
            return (x, key, sigma), None

        def step(carry, ss):
            x, key = carry
            s_cur, s_next = ss
            # predictor: reverse diffusion x <- x + (s_cur^2 - s_next^2) s
            #            + sqrt(s_cur^2 - s_next^2) z   (VE discretisation)
            key, zk = jax.random.split(key)
            var = s_cur ** 2 - s_next ** 2
            s = self.score(state, x, jnp.full((n,), s_cur))
            z = jax.random.normal(zk, x.shape)
            x = x + var * s + jnp.sqrt(var) * z
            if m_corr > 0:
                (x, key, _), _ = jax.lax.scan(
                    corrector, (x, key, s_next), None, length=m_corr)
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, rng), (grid[:-1], grid[1:]))
        # terminal denoise (Tweedie): E[x_0 | x_sigma] = x + sigma^2 s
        s = self.score(state, x, jnp.full((n,), grid[-1]))
        return x + grid[-1] ** 2 * s

    def _pc_sample_vp(self, state: TrainState, rng: jax.Array, n: int,
                      steps: int, m_corr: int, r: float) -> jnp.ndarray:
        """VP/sub-VP Predictor-Corrector over a linear t grid 1 -> t_eps.

        Predictor (VP): the paper's ancestral/reverse-diffusion
        discretisation with the KERNEL-EXACT per-step
        ``beta_i = 1 - exp(-(B(t_i) - B(t_{i+1})))`` (so the chain's
        marginal scaling matches exp(-B/2) with no Euler drift):
        ``x <- (2 - sqrt(1-beta_i)) x + beta_i s + sqrt(beta_i) z``.
        Predictor (sub-VP): Euler-Maruyama of the reverse SDE
        ``dx = [-beta/2 x - g^2 s] dt + g dw-bar`` (g^2 has no ancestral
        form).  Corrector: annealed Langevin with the paper's VP SNR rule
        ``eps = 2 alpha_i (r ||z|| / ||s||)^2``, alpha_i = exp(-dB)."""
        hp = self.hparams
        tg = np.linspace(1.0, float(hp.t_eps), steps, dtype=np.float64)
        m_g, s_g = self._kernel(tg)              # trace-time numpy grids
        B = vp_B(tg, float(hp.beta_min), float(hp.beta_max))
        alpha_d = np.exp(-(B[:-1] - B[1:]))      # per-step exp(-dB)
        coefs = jnp.asarray(np.stack([
            m_g[:-1], s_g[:-1],                  # current level (predictor)
            m_g[1:], s_g[1:],                    # next level (corrector)
            1.0 - alpha_d,                       # discrete beta_i
            self._beta(tg[:-1]),                 # beta(t) for EM (sub-VP)
            self._g2(tg[:-1]),                   # g(t)^2 for EM (sub-VP)
            tg[:-1] - tg[1:],                    # |dt|
        ], axis=1).astype(np.float32))
        shape = (n, self.height, self.width, self.channels)
        rng, init_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, shape)   # prior ~ N(0, I)
        axes = tuple(range(1, len(shape)))

        def corrector(carry, _):
            x, key, sig, mc, alpha = carry
            key, zk = jax.random.split(key)
            s = self.score(state, x, jnp.full((n,), sig), mc)
            z = jax.random.normal(zk, x.shape)
            z_norm = jnp.sqrt(jnp.sum(z ** 2, axis=axes, keepdims=True))
            s_norm = jnp.sqrt(jnp.sum(s ** 2, axis=axes, keepdims=True))
            eps = 2.0 * alpha * (r * z_norm / jnp.maximum(s_norm, 1e-12)) ** 2
            x = x + eps * s + jnp.sqrt(2.0 * eps) * z
            return (x, key, sig, mc, alpha), None

        def step(carry, c):
            x, key = carry
            m_cur, s_cur, m_next, s_next, beta_d, beta_t, g2, dt = (
                c[0], c[1], c[2], c[3], c[4], c[5], c[6], c[7])
            key, zk = jax.random.split(key)
            s = self.score(state, x, jnp.full((n,), s_cur), m_cur)
            z = jax.random.normal(zk, x.shape)
            if hp.sde == "vp":
                x = ((2.0 - jnp.sqrt(1.0 - beta_d)) * x + beta_d * s
                     + jnp.sqrt(beta_d) * z)
            else:  # sub-VP: Euler-Maruyama, reverse time (dt > 0 here)
                x = (x + (0.5 * beta_t * x + g2 * s) * dt
                     + jnp.sqrt(g2 * dt) * z)
            if m_corr > 0:
                (x, key, _, _, _), _ = jax.lax.scan(
                    corrector, (x, key, s_next, m_next, 1.0 - beta_d),
                    None, length=m_corr)
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, rng), coefs)
        # terminal denoise (Tweedie, scaled kernel):
        # E[x_0 | x_t] = (x + sigma^2 s) / m
        s = self.score(state, x, jnp.full((n,), float(s_g[-1])),
                       float(m_g[-1]))
        return (x + float(s_g[-1]) ** 2 * s) / float(m_g[-1])

    def ode_sample(self, state: TrainState, rng: jax.Array, n: int,
                   steps: int | None = None) -> jnp.ndarray:
        """Probability-flow ODE (paper eq. 13): VE form dx/dsigma =
        -sigma s(x, sigma) over the geometric grid; VP/sub-VP form
        dx/dt = -beta/2 x - g^2/2 s over the linear t grid.  Deterministic
        Heun either way."""
        hp = self.hparams
        steps = int(hp.sample_steps) if steps is None else int(steps)
        if hp.sde != "ve":
            return self._ode_sample_vp(state, rng, n, steps)
        grid = jnp.asarray(ve_sigma_grid(
            steps, float(hp.sigma_min), float(hp.sigma_max)))
        shape = (n, self.height, self.width, self.channels)
        x = jax.random.normal(rng, shape) * grid[0]

        def d(x, sigma):
            return -sigma * self.score(state, x, jnp.full((n,), sigma))

        def step(x, ss):
            s_cur, s_next = ss
            d1 = d(x, s_cur)
            x_e = x + (s_next - s_cur) * d1
            d2 = d(x_e, s_next)
            return x + (s_next - s_cur) * 0.5 * (d1 + d2), None

        x, _ = jax.lax.scan(step, x, (grid[:-1], grid[1:]))
        s = self.score(state, x, jnp.full((n,), grid[-1]))
        return x + grid[-1] ** 2 * s  # Tweedie terminal denoise

    def _ode_sample_vp(self, state: TrainState, rng: jax.Array, n: int,
                       steps: int) -> jnp.ndarray:
        """VP/sub-VP probability flow dx/dt = -beta(t)/2 x - g(t)^2/2 s,
        Heun over the linear t grid 1 -> t_eps."""
        hp = self.hparams
        tg = np.linspace(1.0, float(hp.t_eps), steps, dtype=np.float64)
        m_g, s_g = self._kernel(tg)
        coefs = jnp.asarray(np.stack([
            tg[:-1], tg[1:], m_g[:-1], s_g[:-1], m_g[1:], s_g[1:],
        ], axis=1).astype(np.float32))
        shape = (n, self.height, self.width, self.channels)
        x = jax.random.normal(rng, shape)  # prior ~ N(0, I)

        def d(x, t, sig, mc):
            s = self.score(state, x, jnp.full((n,), sig), mc)
            return -0.5 * self._beta(t) * x - 0.5 * self._g2(t) * s

        def step(x, c):
            t_cur, t_next, m_cur, s_cur, m_next, s_next = (
                c[0], c[1], c[2], c[3], c[4], c[5])
            dt = t_next - t_cur
            d1 = d(x, t_cur, s_cur, m_cur)
            x_e = x + dt * d1
            d2 = d(x_e, t_next, s_next, m_next)
            return x + dt * 0.5 * (d1 + d2), None

        x, _ = jax.lax.scan(step, x, coefs)
        s = self.score(state, x, jnp.full((n,), float(s_g[-1])),
                       float(m_g[-1]))
        return (x + float(s_g[-1]) ** 2 * s) / float(m_g[-1])

    def sample(self, state: TrainState, rng: jax.Array, n: int,
               **kw) -> jnp.ndarray:
        fn = (self.pc_sample if self.hparams.sampler == "pc"
              else self.ode_sample)
        return jnp.clip(fn(state, rng, n, **kw), -1.0, 1.0)

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, _ = batch
        imgs = self.preprocess(imgs_raw)
        result = {"real_image": imgs}
        if sample:
            result["fake_image"] = self.sample(
                state, rng, int(self.hparams.sample_batch))
        return result, {}
