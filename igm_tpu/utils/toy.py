"""2-D toy gaussian-mixture prior (AAE's ``prior=toy_gmm``).

Parity: `/root/reference/src/utils/toy.py:57-73` — n equal-weight gaussians
placed on the unit circle, each elongated radially (std 0.35 radial / 0.08
tangential).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class ToyGMM:
    def __init__(self, n: int = 10):
        self.n = n
        angles = np.array([2 * i * np.pi / n for i in range(n)])
        self.mus = np.stack([np.cos(angles), np.sin(angles)], axis=1)  # (n, 2)
        covs = []
        for theta in angles:
            v1 = np.array([np.cos(theta), np.sin(theta)])
            v2 = np.array([np.cos(theta + np.pi / 2), np.sin(theta + np.pi / 2)])
            Q = np.stack([v1, v2], axis=1)
            D = np.diag(np.array([0.35, 0.08]) ** 2)
            covs.append(Q @ D @ Q.T)
        self.covs = np.stack(covs, axis=0)  # (n, 2, 2)
        self.chols = np.linalg.cholesky(self.covs)  # (n, 2, 2)

    def sample(self, rng: jax.Array, n_samples: int):
        """Returns (samples (N,2), component labels (N,))."""
        k_rng, z_rng = jax.random.split(rng)
        comps = jax.random.randint(k_rng, (n_samples,), 0, self.n)
        eps = jax.random.normal(z_rng, (n_samples, 2))
        mus = jnp.asarray(self.mus)[comps]
        chols = jnp.asarray(self.chols)[comps]
        samples = mus + jnp.einsum("nij,nj->ni", chols, eps)
        return samples, comps

    def log_prob(self, samples: jnp.ndarray) -> jnp.ndarray:
        x = samples[:, None, :] - jnp.asarray(self.mus)[None, :, :]  # (N, n, 2)
        inv = jnp.asarray(np.linalg.inv(self.covs))  # (n, 2, 2)
        logdet = jnp.asarray(np.log(np.linalg.det(self.covs)))  # (n,)
        maha = jnp.einsum("bni,nij,bnj->bn", x, inv, x)
        log_comp = -0.5 * (maha + logdet + 2 * jnp.log(2 * jnp.pi)) - jnp.log(self.n)
        return jax.scipy.special.logsumexp(log_comp, axis=1)
