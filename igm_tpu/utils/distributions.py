"""Decoder output distributions for VAE-family models.

Parity: `/root/reference/src/utils/distributions.py:6-36`.
``prob`` returns the per-batch-mean log-probability is *not* taken here —
callers get log p(x|z) summed over pixel dims per sample, exactly like the
reference (which then ``.mean(dim=0)``s).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .losses import bce_with_logits  # noqa: F401  (re-export convenience)

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def get_decode_dist(name: str):
    if name == "gaussian":
        return GaussianDistribution()
    if name == "bernoulli":
        return BernoulliDistribution()
    raise NotImplementedError(f"decoder_dist={name!r}")


class GaussianDistribution:
    """Unit-variance gaussian likelihood; sample = mean (reference parity)."""

    def prob(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        # log N(target; pred, 1) summed over all non-batch dims
        ll = -0.5 * (target - pred) ** 2 - _LOG_SQRT_2PI
        return ll.reshape(ll.shape[0], -1).sum(axis=-1)

    def sample(self, pred: jnp.ndarray, rng=None) -> jnp.ndarray:
        return pred


class BernoulliDistribution:
    """Bernoulli likelihood on probabilities in [0,1]; sample = bernoulli draw."""

    def prob(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        eps = 1e-7
        p = jnp.clip(pred, eps, 1.0 - eps)
        ll = target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p)
        return ll.reshape(ll.shape[0], -1).sum(axis=-1)

    def sample(self, pred: jnp.ndarray, rng=None) -> jnp.ndarray:
        if rng is None:
            return pred  # deterministic fallback (mean image)
        return jax.random.bernoulli(rng, pred).astype(pred.dtype)
