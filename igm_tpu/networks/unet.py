"""DDPM UNet denoiser (parity: src/models/ddpm.py:39-261), NHWC Flax.

Architecture per resolution: 2x ResnetBlock (time-FiLM-add), residual
pre-normed linear attention, down/up-sample; middle block-attn-block; the
first skip connection is unused (reference quirk: ups iterate in_out[1:],
`ddpm.py:221`).
"""
from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import linear_attention, linear_attention_flat
from .base import Conv, ConvTranspose, Dense


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(nn.softplus(x))


class SinusoidalPosEmb(nn.Module):
    """Timestep embedding (ddpm.py:47-59)."""
    dim: int

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        freq = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / (half - 1)))
        args = t.astype(jnp.float32)[:, None] * freq[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over channels with (std + eps) denominator (ddpm.py:85-95).

    Statistics in f32; output cast back to the input dtype so bf16 activation
    traffic stays bf16.
    """
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.param("g", nn.initializers.ones, (self.dim,))
        b = self.param("b", nn.initializers.zeros, (self.dim,))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        std = jnp.sqrt(xf.var(axis=-1, keepdims=True))
        return (((xf - mean) / (std + self.eps)) * g + b).astype(x.dtype)


class _BareKernel(nn.Module):
    shape: tuple

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        from .base import torch_kernel_init
        return self.param("kernel", torch_kernel_init, self.shape)


class QKVKernel(nn.Module):
    """Bare (1,1,in,3*hidden) conv-kernel param at the EXACT param path,
    shape, and init of the ``Conv(hidden*3, 1, use_bias=False)`` it
    replaces — base.Conv wraps an inner nn.Conv, so the path is
    Conv_0/Conv_0/kernel (checkpoint- and torch-parity-compatible).  Never
    run as a conv: the caller slices the KERNEL into the three projections
    instead of slicing the fused 3*hidden activation.  The round-4
    flagship trace (benchmarks/profiles_r4/ddpm_trace.md) showed the
    materialised bf16[256,1024,384] qkv tensor costing ~1.2 ms/step in
    copy+pad ops; weight slices are free."""
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return _BareKernel((1, 1, self.in_dim, self.out_dim),
                           name="Conv_0")()


class LinearAttention(nn.Module):
    """(ddpm.py:146-166) 1x1-conv qkv + linear attention + 1x1-conv out."""
    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c_in = x.shape
        hidden = self.heads * self.dim_head
        mode = os.environ.get("IGM_ATTN_QKV", "wslice")
        if mode == "wslice":
            # per-projection GEMMs with KERNEL slices: the fused 384-wide
            # qkv activation never exists, so neither do its layout
            # copies.  Same math, same param tree ("Conv_0/kernel").
            kern = QKVKernel(c_in, hidden * 3, name="Conv_0")()
            w3 = kern.reshape(c_in, 3 * hidden)
            if self.dtype is not None:
                w3 = w3.astype(self.dtype)
            x_flat = x.reshape(b, h * w, c_in)
            if self.dtype is not None:
                x_flat = x_flat.astype(self.dtype)
            q = x_flat @ w3[:, :hidden]
            k = x_flat @ w3[:, hidden:2 * hidden]
            v = x_flat @ w3[:, 2 * hidden:]
            out = linear_attention_flat(q, k, v, self.heads)
            out = out.reshape(b, h, w, hidden)
        else:
            qkv = Conv(hidden * 3, 1, use_bias=False, dtype=self.dtype)(x)
            if mode == "split_heads":
                # legacy head-split basis (round-2 default); kept for A/B —
                # the 5-D (b,n,3,h,d) tensors cost ~2.5-3 ms/step in layout
                # copies (benchmarks/profiles/ddpm_trace.md)
                qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
                q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
                out = linear_attention(q, k, v).reshape(b, h, w, hidden)
            else:  # "conv": round-3 default — fused conv + activation slice
                flat = qkv.reshape(b, h * w, 3 * hidden)
                q, k, v = (flat[..., :hidden], flat[..., hidden:2 * hidden],
                           flat[..., 2 * hidden:])
                out = linear_attention_flat(q, k, v, self.heads)
                out = out.reshape(b, h, w, hidden)
        # explicit name: matches the auto-assigned "Conv_1" of the
        # conv-path layout (in wslice mode QKVKernel holds "Conv_0")
        return Conv(self.dim, 1, dtype=self.dtype, name="Conv_1")(out)


class AttnBlock(nn.Module):
    """Residual(PreNorm(LinearAttention)) (ddpm.py:202-233)."""
    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x + LinearAttention(self.dim, dtype=self.dtype)(
            ChannelLayerNorm(self.dim)(x))


class GroupNormMish(nn.Module):
    """GroupNorm(eps=1e-5) + Mish with a config-switchable fused Pallas path.

    Param names match flax nn.GroupNorm ("scale"/"bias") so the tree is
    identical whichever path executes; ``pallas`` (model config
    ``pallas_gn: true``, or env IGM_PALLAS_GN=1 read once at model
    construction — never at trace time) enables the fused kernel
    (igm_tpu.ops.pallas_groupnorm) on TPU.
    """
    groups: int = 8
    dtype: Any = None
    pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if self.pallas and jax.default_backend() == "tpu":
            from ..ops.pallas_groupnorm import group_norm_mish
            return group_norm_mish(x, scale, bias, self.groups)
        xf = x.astype(jnp.float32)
        n, h, w, _ = xf.shape
        grouped = xf.reshape(n, h, w, self.groups, c // self.groups)
        # one-pass stats (E[x^2] - E[x]^2), matching flax's lowering — the
        # two-pass jnp.var form costs an extra sweep over the activation
        # (measured: -12% DDPM step throughput)
        mean = grouped.mean(axis=(1, 2, 4), keepdims=True)
        mean2 = (grouped * grouped).mean(axis=(1, 2, 4), keepdims=True)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        xhat = ((grouped - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(x.shape)
        y = xhat * scale + bias
        return mish(y).astype(x.dtype)


class Block(nn.Module):
    """conv3x3 -> GroupNorm(8) -> Mish (ddpm.py:109-118).

    The conv runs in ``dtype`` (bfloat16 on TPU); GroupNorm statistics stay
    f32; activation traffic stays in compute dtype (measured: norm+mish was
    ~15% of the f32 step).
    """
    dim_out: int
    groups: int = 8
    dtype: Any = None
    pallas_gn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv(self.dim_out, 3, 1, 1, dtype=self.dtype)(x)
        return GroupNormMish(self.groups, dtype=self.dtype,
                             pallas=self.pallas_gn)(x)


class ResnetBlock(nn.Module):
    """Two Blocks with time-embedding add between them (ddpm.py:121-143)."""
    dim: int
    dim_out: int
    use_time_emb: bool = True
    dtype: Any = None
    pallas_gn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: Optional[jnp.ndarray]) -> jnp.ndarray:
        h = Block(self.dim_out, dtype=self.dtype, pallas_gn=self.pallas_gn)(x)
        if self.use_time_emb and t is not None:
            # time-FiLM add in compute dtype (avoid f32 promotion of h)
            h = h + Dense(self.dim_out, dtype=self.dtype)(mish(t))[:, None, None, :]
        h = Block(self.dim_out, dtype=self.dtype, pallas_gn=self.pallas_gn)(h)
        if self.dim != self.dim_out:
            x = Conv(self.dim_out, 1, dtype=self.dtype)(x)
        return h + x


class Unet(nn.Module):
    """(ddpm.py:170-261).  Input/output NHWC; ``time`` is (B,) int/float.

    ``num_classes > 0`` adds class-conditioning (beyond parity — the
    reference UNet is unconditional): a learned embedding table of
    ``num_classes + 1`` rows is added to the time embedding, where row
    ``num_classes`` is the *null token* trained for classifier-free
    guidance (Ho & Salimans 2022).  ``y`` is a (B,) int32 label batch and
    is required iff ``num_classes > 0``.
    """
    dim: int
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    groups: int = 8
    channels: int = 3
    with_time_emb: bool = True
    num_classes: int = 0  # 0 = unconditional (reference parity)
    dtype: Any = None  # compute dtype for convs (bfloat16 on TPU)
    remat: bool = False  # jax.checkpoint each resnet block (memory <-> FLOPs)
    pallas_gn: bool = False  # fused GroupNorm+Mish Pallas kernel (TPU only)

    @nn.compact
    def __call__(self, x: jnp.ndarray, time: jnp.ndarray,
                 y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        dims = [self.channels] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)
        RB = nn.remat(ResnetBlock) if self.remat else ResnetBlock

        if self.with_time_emb:
            t = SinusoidalPosEmb(self.dim)(time)
            t = Dense(self.dim * 4)(t)
            t = mish(t)
            t = Dense(self.dim)(t)
        else:
            t = None
        if self.num_classes:
            if y is None:
                raise ValueError("conditional Unet (num_classes>0) needs y")
            emb = nn.Embed(self.num_classes + 1, self.dim, name="class_emb")
            cls = emb(y.astype(jnp.int32))
            t = cls if t is None else t + cls

        skips = []
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            x = RB(x.shape[-1], dim_out, dtype=self.dtype,
                   pallas_gn=self.pallas_gn)(x, t)
            x = RB(dim_out, dim_out, dtype=self.dtype,
                   pallas_gn=self.pallas_gn)(x, t)
            x = AttnBlock(dim_out, dtype=self.dtype)(x)
            skips.append(x)
            if not is_last:
                x = Conv(dim_out, 3, 2, 1, dtype=self.dtype)(x)  # Downsample

        mid = dims[-1]
        x = RB(mid, mid, dtype=self.dtype, pallas_gn=self.pallas_gn)(x, t)
        x = AttnBlock(mid, dtype=self.dtype)(x)
        x = RB(mid, mid, dtype=self.dtype, pallas_gn=self.pallas_gn)(x, t)

        for dim_in, dim_out in reversed(in_out[1:]):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = RB(dim_out * 2, dim_in, dtype=self.dtype,
                   pallas_gn=self.pallas_gn)(x, t)
            x = RB(dim_in, dim_in, dtype=self.dtype,
                   pallas_gn=self.pallas_gn)(x, t)
            x = AttnBlock(dim_in, dtype=self.dtype)(x)
            x = ConvTranspose(dim_in, 4, 2, 1, dtype=self.dtype)(x)  # Upsample

        out_dim = self.out_dim if self.out_dim is not None else self.channels
        x = Block(dims[1], dtype=self.dtype, pallas_gn=self.pallas_gn)(x)
        return Conv(out_dim, 1)(x).astype(jnp.float32)
