"""32x32 DCGAN generator/discriminator (parity: src/networks/conv32.py)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .base import BaseNetwork, Conv, ConvTranspose, Norm, get_act_function


class Decoder(BaseNetwork):
    """latent -> 2x2 -> 4 -> 8 -> 16 -> 32 (conv32.py:12-38)."""
    ngf: int = 32
    norm_type: Optional[str] = "batch"
    output_act: str = "tanh"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        n = x.shape[0]
        x = x.reshape(n, 1, 1, -1)
        for feats, k, s, p in ((self.ngf * 8, 2, 1, 0),
                               (self.ngf * 4, 4, 2, 1),
                               (self.ngf * 2, 4, 2, 1),
                               (self.ngf, 4, 2, 1)):
            x = ConvTranspose(feats, k, s, p)(x)
            x = Norm(self.norm_type)(x, train=train)
            x = nn.relu(x)
        x = ConvTranspose(self.output_channel, 4, 2, 1)(x)
        return get_act_function(self.output_act)(x)


class Encoder(BaseNetwork):
    """32 -> 16 -> 8 -> 4 -> 2 -> 1x1 logits (conv32.py:41-82)."""
    ndf: int = 32
    norm_type: Optional[str] = "batch"
    return_features: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        n = x.shape[0]
        x = Conv(self.ndf, 4, 2, 1)(x)
        x = nn.leaky_relu(x, 0.2)
        x = Conv(self.ndf * 2, 4, 2, 1)(x)
        x = Norm(self.norm_type)(x, train=train)
        x = nn.leaky_relu(x, 0.2)
        x = Conv(self.ndf * 4, 4, 2, 1)(x)
        x = Norm(self.norm_type)(x, train=train)
        x = nn.leaky_relu(x, 0.2)
        features = x
        x = Conv(self.ndf * 8, 4, 2, 1)(x)
        x = Norm(self.norm_type)(x, train=train)
        x = nn.leaky_relu(x, 0.2)
        x = Conv(self.output_channel, 2, 1, 0)(x)
        out = x.reshape(n, -1)
        if self.return_features:
            return out, features.reshape(n, -1)
        return out
