"""VQ-VAE encoder/decoder (parity: src/networks/vqvae.py).

Quirk preserved consciously: the reference's ``ResidualStack`` builds its
layer list as ``[ResidualLayer(...)] * n`` (`src/networks/vqvae.py:41-43`),
so all n residual applications share ONE set of parameters.  We reproduce
that (``tied=True`` default) because the published sample grids were trained
with tied blocks; set ``tied=False`` for the standard untied stack.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .base import Conv, ConvTranspose


class ResidualLayer(nn.Module):
    """relu -> 3x3 conv -> relu -> 1x1 conv, residual (vqvae.py:5-27)."""
    h_dim: int
    res_h_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        r = nn.relu(x)
        r = Conv(self.res_h_dim, 3, 1, 1, use_bias=False)(r)
        r = nn.relu(r)
        r = Conv(self.h_dim, 1, 1, 0, use_bias=False)(r)
        return x + r


class ResidualStack(nn.Module):
    h_dim: int
    res_h_dim: int
    n_res_layers: int = 3
    tied: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.tied:
            layer = ResidualLayer(self.h_dim, self.res_h_dim)
            for _ in range(self.n_res_layers):
                x = layer(x)
        else:
            for _ in range(self.n_res_layers):
                x = ResidualLayer(self.h_dim, self.res_h_dim)(x)
        return nn.relu(x)


class Encoder(nn.Module):
    """H/4 x W/4 latent grid encoder (vqvae.py:52-96)."""
    input_channel: int
    output_channel: int
    n_res_layers: int = 3
    res_h_dim: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = Conv(self.output_channel // 2, 4, 2, 1)(x)
        x = nn.relu(x)
        x = Conv(self.output_channel, 4, 2, 1)(x)
        x = nn.relu(x)
        x = Conv(self.output_channel, 3, 1, 1)(x)
        return ResidualStack(self.output_channel, self.res_h_dim,
                             self.n_res_layers)(x)


class Decoder(nn.Module):
    """latent grid -> image (vqvae.py:99-136)."""
    input_channel: int
    output_channel: int
    h_dim: int = 128
    n_res_layers: int = 3
    res_h_dim: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = ConvTranspose(self.h_dim, 3, 1, 1)(x)
        x = ResidualStack(self.h_dim, self.res_h_dim, self.n_res_layers)(x)
        x = ConvTranspose(self.h_dim // 2, 4, 2, 1)(x)
        x = nn.relu(x)
        return ConvTranspose(self.output_channel, 4, 2, 1)(x)
