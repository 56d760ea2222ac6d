"""Gaussian-diffusion schedule tables + transition math.

Parity: `src/models/ddpm.py:275-350` (cosine default / linear schedules, the
10 registered buffer tables) and the q/p transition equations
(`ddpm.py:352-444`).  Tables are computed in float64 numpy at construction
(like the reference) and stored as float32 constants; per-step math is pure
elementwise and fuses into the UNet dispatch under jit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    scale = 1000.0 / timesteps
    return np.linspace(scale * 1e-4, scale * 0.02, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


class DiffusionTables(NamedTuple):
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray


def make_tables(timesteps: int, schedule: str = "cosine") -> DiffusionTables:
    betas = (cosine_beta_schedule(timesteps) if schedule == "cosine"
             else linear_beta_schedule(timesteps))
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    posterior_variance = (betas * (1.0 - alphas_cumprod_prev)
                          / (1.0 - alphas_cumprod))
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return DiffusionTables(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev)
                                 / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32((1.0 - alphas_cumprod_prev) * np.sqrt(alphas)
                                 / (1.0 - alphas_cumprod)),
    )


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """table[t] broadcast to an image batch of rank ``ndim`` (ddpm.py:263)."""
    out = table[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


def q_sample(tables: DiffusionTables, x_start, t, noise):
    """Forward noising q(x_t | x_0) (ddpm.py:433-444)."""
    return (extract(tables.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + extract(tables.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
            * noise)


def predict_start_from_noise(tables: DiffusionTables, x_t, t, noise):
    return (extract(tables.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - extract(tables.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise)


def q_posterior(tables: DiffusionTables, x_start, x_t, t):
    mean = (extract(tables.posterior_mean_coef1, t, x_t.ndim) * x_start
            + extract(tables.posterior_mean_coef2, t, x_t.ndim) * x_t)
    var = extract(tables.posterior_variance, t, x_t.ndim)
    log_var = extract(tables.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, var, log_var


# --- v-parameterization + SNR helpers (beyond parity; Salimans & Ho 2022,
# "Progressive Distillation", eq. 11-13; Hang et al. 2023 "Min-SNR") --------
# v := sqrt(ac_t) * eps - sqrt(1-ac_t) * x0.  Every sampler in the framework
# consumes eps, so a v-predicting network is adapted at ONE choke point
# (models/ddpm.py::_eps) via eps = sqrt(1-ac_t) * x_t + sqrt(ac_t) * v —
# pure elementwise table math that fuses into the denoiser dispatch.

def v_target(tables: DiffusionTables, x_start, t, noise):
    """Training target for parameterization="v"."""
    return (extract(tables.sqrt_alphas_cumprod, t, x_start.ndim) * noise
            - extract(tables.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
            * x_start)


def eps_from_v(tables: DiffusionTables, x_t, t, v):
    """Convert a v prediction to an eps prediction (exact identity)."""
    return (extract(tables.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * x_t
            + extract(tables.sqrt_alphas_cumprod, t, x_t.ndim) * v)


def snr(tables: DiffusionTables, t, ndim: int):
    """Signal-to-noise ratio ac_t / (1 - ac_t), broadcast to rank ndim."""
    ac = extract(tables.alphas_cumprod, t, ndim)
    return ac / (1.0 - ac)


def loss_weight(tables: DiffusionTables, t, ndim: int, parameterization: str,
                snr_gamma: float):
    """Min-SNR-gamma per-timestep loss weight (Hang et al. 2023).

    eps-prediction: min(SNR, gamma) / SNR; v-prediction: min(SNR, gamma)
    / (SNR + 1) — the v-loss already carries an implicit (SNR+1) factor
    relative to the x0 loss.  ``snr_gamma <= 0`` disables (weight 1)."""
    if snr_gamma <= 0:
        return jnp.ones((1,) * ndim, jnp.float32)
    s = snr(tables, t, ndim)
    capped = jnp.minimum(s, snr_gamma)
    if parameterization == "v":
        return capped / (s + 1.0)
    return capped / s
