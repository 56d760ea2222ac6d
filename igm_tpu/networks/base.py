"""Shared building blocks for the network zoo.

Design notes (TPU-first):
- Layout is **NHWC** everywhere (XLA TPU's native conv layout); the reference
  is NCHW torch (`/root/reference/src/networks/*`).  Callbacks/datamodules
  speak NHWC too, so there are no transposes on the hot path.
- Weight/bias initialisation reproduces torch's nn.Linear/nn.Conv2d defaults
  (kaiming-uniform(a=sqrt(5)) ⇒ U(±sqrt(1/fan_in))): GAN training dynamics are
  sensitive to the init distribution, and the reference relies on torch
  defaults.
- ``norm_type`` ∈ {batch, instance, layer, None} mirrors
  `src/networks/basic.py:22-47` (layer = GroupNorm(1 group) with affine;
  instance = per-sample/per-channel spatial norm WITHOUT affine, torch's
  InstanceNorm2d default).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch kaiming_uniform(a=sqrt(5)) == variance_scaling(1/3, fan_in, uniform)
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_bias_init(fan_in: int) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return torch_bias_init(key, shape, dtype, fan_in=max(fan_in, 1))
    return init


def get_act_function(act: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation factory (parity: src/networks/basic.py:8-20)."""
    if act == "relu":
        return nn.relu
    if act == "leaky_relu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if act == "identity":
        return lambda x: x
    if act == "sigmoid":
        return nn.sigmoid
    if act == "tanh":
        return nn.tanh
    if act == "elu":
        return nn.elu
    if act == "mish":
        return lambda x: x * jnp.tanh(nn.softplus(x))
    raise NotImplementedError(f"act={act!r}")


def _canon_norm(norm_type) -> Optional[str]:
    # configs contain: batch / instance / layer / null / False / "None"
    if norm_type in (None, "None", "none", False, "null"):
        return None
    return str(norm_type)


class Norm(nn.Module):
    """Config-selected normalisation over the trailing channel axis.

    ``train`` only matters for batch norm (running stats live in the
    ``batch_stats`` collection, like torch's running_mean/var buffers).
    """
    norm_type: Optional[str]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        nt = _canon_norm(self.norm_type)
        if nt is None:
            return x
        if nt == "batch":
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x)
        if nt == "layer":
            # GroupNorm(num_groups=1) with affine — torch parity
            return nn.GroupNorm(num_groups=1, epsilon=1e-5)(x)
        if nt == "instance":
            # torch InstanceNorm2d default: affine=False, per-sample spatial
            if x.ndim < 3:
                raise ValueError("instance norm needs spatial dims (NHWC)")
            axes = tuple(range(1, x.ndim - 1))
            mean = x.mean(axis=axes, keepdims=True)
            var = x.var(axis=axes, keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        raise NotImplementedError(f"norm_type={nt!r}")


class Conv(nn.Module):
    """torch-Conv2d-parity conv: explicit symmetric padding, torch init.

    ``dtype`` selects the computation dtype (bfloat16 puts the conv on the
    MXU's fast path; params stay float32).
    """
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        fan_in = x.shape[-1] * k * k // self.feature_group_count
        return nn.Conv(
            self.features, (k, k), strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=make_bias_init(fan_in),
            feature_group_count=self.feature_group_count,
            dtype=self.dtype,
        )(x)


class ConvTranspose(nn.Module):
    """torch-ConvTranspose2d-parity: out = (in-1)*s - 2p + k.

    Maps to lax.conv_transpose with explicit padding (k-1-p) per side.
    """
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, p = self.kernel_size, self.padding
        pad = k - 1 - p
        fan_in = x.shape[-1] * k * k
        return nn.ConvTranspose(
            self.features, (k, k), strides=(self.stride, self.stride),
            padding=[(pad, pad)] * 2,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=make_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


class Dense(nn.Module):
    """torch-Linear-parity dense layer."""
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features, use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=make_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


class BaseNetwork(nn.Module):
    """Channel-metadata carrier (parity: src/networks/base.py:16-20).

    Concrete networks subclass this and declare their constructor fields;
    ``input_channel``/``output_channel`` are injected by the model layer
    exactly like the reference's hydra instantiate calls.
    """
    input_channel: int
    output_channel: int
