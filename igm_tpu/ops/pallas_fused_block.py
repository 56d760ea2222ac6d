"""Fused UNet Block forward: conv3x3 + bias + GroupNorm(8) + Mish, one pass.

The flagship DDPM step's remaining device time is conv fusions (12.9 ms)
plus GN/Mish HBM sweeps (3.8 ms) — see docs/MFU.md round-3 trace.  XLA
cannot fuse ACROSS the conv boundary: the conv output is written to HBM,
then the GroupNorm stats pass re-reads it, then the normalise+Mish pass
reads it again.  This kernel is the round-2 verdict's suggested shape — a
block-scale fusion (`/root/reference/src/models/ddpm.py:109-118` is the
unit: Conv2d -> GroupNorm -> Mish) — computing the conv as 9 shifted
GEMMs on the MXU with the activation resident in VMEM, then the GN
statistics, normalisation and Mish on the VPU before the single output
write.  Per grid step it processes a tile of NB samples: the 9 GEMMs run
at M = NB*H*W (MXU-filling even at 32x32).

Mosaic constraint that shaped the code: reshapes must never split the
lane (channel) dimension, so GroupNorm statistics are computed per sample
with 2-D ops only — channel sums reduced into groups via a one-hot
(Cout, groups) matmul and broadcast back with its transpose.

Forward-only by design: the backward keeps XLA's conv dgrad/wgrad (a
`jax.custom_vjp` wrapper recomputes through the XLA path), so the kernel
competes only where the fusion argument applies.  Whether it WINS against
XLA's producer/consumer fusion at the flagship shapes is decided by
measurement (tools/bench_fused_block.py) like every other kernel in this
framework (PARITY.md kernel-vs-XLA table).
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _mish_f32(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _kernel(x_ref, w_ref, b_ref, scale_ref, bias_ref, o_ref, *,
            nb: int, h: int, w: int, cin: int, cout: int, groups: int,
            eps: float):
    """One grid step: NB padded samples (NB, H+2, W+2, Cin) -> (NB, H, W, Cout)."""
    hw = h * w
    acc = jnp.zeros((nb * hw, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            a = x_ref[:, dy:dy + h, dx:dx + w, :].reshape(nb * hw, cin)
            k = w_ref[dy, dx]  # (Cin, Cout)
            acc += jax.lax.dot_general(
                a, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc += b_ref[:].astype(jnp.float32)[None, :]

    # GroupNorm + Mish, 2-D ops only (lane dim = channels, never split):
    # one-hot (Cout, groups) reduces channel sums into group sums; its
    # transpose broadcasts group stats back to channels.
    cg = cout // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (cout, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (cout, groups), 1)
    gmat = (ch // cg == gr).astype(jnp.float32)      # (Cout, groups)
    denom = float(hw * cg)
    scale = scale_ref[:].astype(jnp.float32)[None, :]
    bias = bias_ref[:].astype(jnp.float32)[None, :]
    for s_i in range(nb):
        blk = acc[s_i * hw:(s_i + 1) * hw]           # (hw, Cout)
        csum = jnp.sum(blk, axis=0, keepdims=True)   # (1, Cout)
        csq = jnp.sum(blk * blk, axis=0, keepdims=True)
        mean_g = jnp.dot(csum, gmat,
                         preferred_element_type=jnp.float32) / denom
        msq_g = jnp.dot(csq, gmat,
                        preferred_element_type=jnp.float32) / denom
        mean_c = jnp.dot(mean_g, gmat.T,
                         preferred_element_type=jnp.float32)  # (1, Cout)
        msq_c = jnp.dot(msq_g, gmat.T,
                        preferred_element_type=jnp.float32)
        var_c = jnp.maximum(msq_c - mean_c * mean_c, 0.0)
        y = (blk - mean_c) * jax.lax.rsqrt(var_c + eps) * scale + bias
        o_ref[s_i] = _mish_f32(y).astype(o_ref.dtype).reshape(h, w, cout)


@functools.partial(jax.jit,
                   static_argnames=("groups", "nb", "eps", "interpret"))
def fused_block_fwd(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                    scale: jnp.ndarray, bias: jnp.ndarray,
                    groups: int = 8, nb: int = 8, eps: float = 1e-5,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """mish(GroupNorm(conv3x3_same(x, w) + b) * scale + bias), fused.

    x: (N, H, W, Cin); w: (3, 3, Cin, Cout) (HWIO); b/scale/bias: (Cout,).
    N must be divisible by ``nb`` (the per-grid-step sample tile).
    Output dtype follows x (bf16 activations stay bf16); conv accumulation
    and GN statistics are f32, exactly like the XLA path.
    """
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, cin), w.shape
    assert n % nb == 0, (n, nb)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kern = functools.partial(_kernel, nb=nb, h=h, w=ww, cin=cin, cout=cout,
                             groups=groups, eps=eps)
    return pl.pallas_call(
        kern,
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, h + 2, ww + 2, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda i: (0,)),
            pl.BlockSpec((cout,), lambda i: (0,)),
            pl.BlockSpec((cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((nb, h, ww, cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, ww, cout), x.dtype),
        interpret=interpret,
    )(xp, w, b, scale, bias)


def xla_block_fwd(x, w, b, scale, bias, groups: int = 8, eps: float = 1e-5,
                  dtype: Any = None):
    """The XLA path this kernel competes with (mirrors networks/unet.py
    Block: conv in compute dtype, GN stats f32, output in x.dtype)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + b.astype(jnp.float32)[None, None, None, :]
    n, h, ww, c = y.shape
    g = y.reshape(n, h, ww, groups, c // groups)
    mean = g.mean(axis=(1, 2, 4), keepdims=True)
    mean2 = (g * g).mean(axis=(1, 2, 4), keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    xhat = ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(y.shape)
    out = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return _mish_f32(out).astype(x.dtype)
