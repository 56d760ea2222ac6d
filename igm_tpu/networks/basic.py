"""MLP and MNIST-size DCGAN networks (parity: src/networks/basic.py).

All modules keep the reference's constructor signatures so config
``_target_`` swaps are drop-in; forward semantics are NHWC.
``return_features`` replaces the reference's forward-hook FeatureExtractor
(`src/networks/utils.py:4-20`) with an explicit second output — the idiomatic
functional-JAX design for the VAE-GAN feature-space loss.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .base import (BaseNetwork, Conv, ConvTranspose, Dense, Norm,
                   get_act_function)


class LinearAct(nn.Module):
    """fc -> norm -> act -> dropout (src/networks/basic.py:49-61)."""
    features: int
    act: str = "relu"
    dropout: float = 0.0
    norm_type: Optional[str] = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = Dense(self.features)(x)
        x = Norm(self.norm_type)(x, train=train)
        x = get_act_function(self.act)(x)
        if self.dropout and self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class MLPEncoder(BaseNetwork):
    """(src/networks/basic.py:64-113): first layer layer-normed, rest norm_type."""
    hidden_dims: Sequence[int] = (256,)
    width: int = 1
    height: int = 1
    dropout: float = 0.0
    norm_type: Optional[str] = "batch"
    return_features: bool = False
    output_act: str = "identity"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        n = x.shape[0]
        x = x.reshape(n, -1)
        x = LinearAct(self.hidden_dims[0], "leaky_relu", self.dropout,
                      norm_type="layer")(x, train=train)
        for h in self.hidden_dims[1:]:
            x = LinearAct(h, "leaky_relu", self.dropout,
                          norm_type=self.norm_type)(x, train=train)
        features = x
        out = LinearAct(self.output_channel, self.output_act,
                        norm_type=None)(x, train=train)
        if self.return_features:
            return out, features.reshape(n, -1)
        return out


class MLPDecoder(BaseNetwork):
    """(src/networks/basic.py:116-145): relu stack, reshaped to an image."""
    hidden_dims: Sequence[int] = (256,)
    width: int = 1
    height: int = 1
    output_act: str = "tanh"
    norm_type: Optional[str] = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for h in self.hidden_dims:
            x = LinearAct(h, "relu", norm_type=self.norm_type)(x, train=train)
        x = LinearAct(self.output_channel * self.width * self.height,
                      self.output_act, norm_type=None)(x, train=train)
        return x.reshape(-1, self.height, self.width, self.output_channel)


class ConvDecoder(BaseNetwork):
    """28x28 DCGAN decoder: 1->4->7->14->28 (src/networks/basic.py:148-170)."""
    ngf: int = 32
    norm_type: Optional[str] = "batch"
    output_act: str = "tanh"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        n = x.shape[0]
        x = x.reshape(n, 1, 1, -1)
        for feats, k, s, p in ((self.ngf * 4, 4, 1, 0),
                               (self.ngf * 2, 3, 2, 1),
                               (self.ngf, 4, 2, 1)):
            x = ConvTranspose(feats, k, s, p)(x)
            x = Norm(self.norm_type)(x, train=train)
            x = nn.relu(x)
        x = ConvTranspose(self.output_channel, 4, 2, 1)(x)
        return get_act_function(self.output_act)(x)


class ConvEncoder(BaseNetwork):
    """28x28 DCGAN encoder, mirror of ConvDecoder (basic.py:173-204)."""
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
        x = Conv(self.ndf * 4, 3, 2, 1)(x)
        x = Norm(self.norm_type)(x, train=train)
        x = nn.leaky_relu(x, 0.2)
        features = x
        x = Conv(self.output_channel, 4, 1, 0)(x)
        out = x.reshape(n, self.output_channel)
        if self.return_features:
            return out, features.reshape(n, -1)
        return out
