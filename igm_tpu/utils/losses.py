"""Loss functions shared across the model zoo.

Parity targets: `/root/reference/src/utils/losses.py:4-38`.

Note on the hinge loss: the reference's "real" branch computes
``maximum(1 - pred, ones)`` (`losses.py:19`) which degenerates to
``max(1 - pred, 1)`` instead of the standard ``max(0, 1 - pred)``.  We
implement the *standard* hinge loss (both branches ``max(0, 1 ∓ pred)``) —
a conscious divergence recorded in SURVEY.md §8; the reference's variant
yields a constant-1 loss whenever the discriminator is right, which is a bug,
not a design choice.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise sigmoid cross-entropy (torch BCEWithLogits parity)."""
    # log(1 + exp(-|x|)) + max(x, 0) - x * target  — numerically stable
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def adversarial_loss(pred: jnp.ndarray, target_is_real: bool = True,
                     loss_mode: str = "vanilla") -> jnp.ndarray:
    """GAN adversarial loss: vanilla (BCE), lsgan (MSE), hinge."""
    if loss_mode == "vanilla":
        target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
        return bce_with_logits(pred, target).mean()
    if loss_mode == "lsgan":
        target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
        return jnp.mean((pred - target) ** 2)
    if loss_mode == "hinge":
        if target_is_real:
            return jnp.maximum(1.0 - pred, 0.0).mean()
        return jnp.maximum(1.0 + pred, 0.0).mean()
    raise NotImplementedError(f"loss_mode={loss_mode!r}")


def normal_kld(mu: jnp.ndarray, log_sigma: jnp.ndarray) -> jnp.ndarray:
    """KL(N(mu, sigma) || N(0, 1)), summed over latent dims, mean over batch.

    Matches `/root/reference/src/utils/losses.py:26-28`.
    """
    kl = -0.5 * jnp.sum(1.0 + 2.0 * log_sigma - mu ** 2 - jnp.exp(2.0 * log_sigma), axis=-1)
    return kl.mean()


def symmetry_contra_loss(feat1: jnp.ndarray, feat2: jnp.ndarray,
                         temperature: float = 0.07) -> jnp.ndarray:
    """CLIP-style symmetric InfoNCE (`losses.py:30-38`; unused by configs)."""
    logits = jnp.einsum("ik,jk->ij", feat1, feat2) / temperature
    d = logits.shape[0]
    labels = jnp.arange(d)
    def ce(lg):
        return -jnp.take_along_axis(jax.nn.log_softmax(lg, axis=-1),
                                    labels[:, None], axis=-1).mean()
    return (ce(logits) + ce(logits.T)) / 2.0
