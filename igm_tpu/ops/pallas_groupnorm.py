"""Pallas TPU kernel: fused GroupNorm + Mish (DDPM Block epilogue).

SURVEY.md §2.1 names conv+GroupNorm+Mish the Pallas candidate; the conv
belongs to XLA (MXU), so the fusable piece is the norm+gate epilogue —
measured at ~15% of the f32 DDPM step.  One kernel pass per sample computes
group statistics, normalises, applies the affine and the Mish gate with the
activation resident in VMEM (vs XLA's two HBM passes: stats, then apply).

Backward is a second kernel (same tiling) emitting dx and per-sample
dgamma/dbeta partials that XLA sums over the batch.

Gated behind ``IGM_PALLAS_GN=1`` until benchmarked faster than XLA's fusion
on the target shape (see igm_tpu/networks/unet.py Block).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mish(y):
    return y * jnp.tanh(jax.nn.softplus(y))


def _mish_grad(y):
    sp = jax.nn.softplus(y)
    t = jnp.tanh(sp)
    return t + y * jax.nn.sigmoid(y) * (1.0 - t * t)


def _stats(xf, groups):
    """xf: (H, W, C) f32 -> broadcastable (1, 1, C) mean and inv-std."""
    c = xf.shape[-1]
    cg = c // groups
    s1 = xf.sum(axis=(0, 1))                      # (C,)
    s2 = (xf * xf).sum(axis=(0, 1))               # (C,)
    n_per_group = xf.shape[0] * xf.shape[1] * cg
    gm = s1.reshape(groups, cg).sum(axis=1) / n_per_group
    gs2 = s2.reshape(groups, cg).sum(axis=1) / n_per_group
    gv = gs2 - gm * gm
    mean_c = jnp.repeat(gm, cg)                   # (C,)
    inv_c = jax.lax.rsqrt(jnp.repeat(gv, cg) + 1e-5)
    return mean_c[None, None, :], inv_c[None, None, :]


def _fwd_kernel(groups, x_ref, gamma_ref, beta_ref, o_ref):
    xf = x_ref[0].astype(jnp.float32)             # (H, W, C)
    mean, inv = _stats(xf, groups)
    y = (xf - mean) * inv * gamma_ref[0] + beta_ref[0]
    o_ref[0] = _mish(y).astype(o_ref.dtype)


def _bwd_kernel(groups, x_ref, gamma_ref, beta_ref, g_ref,
                dx_ref, dgamma_ref, dbeta_ref):
    xf = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    gamma = gamma_ref[0]
    mean, inv = _stats(xf, groups)
    xhat = (xf - mean) * inv
    y = xhat * gamma + beta_ref[0]
    dy = g * _mish_grad(y)
    dgamma_ref[0, 0] = (dy * xhat).sum(axis=(0, 1))
    dbeta_ref[0, 0] = dy.sum(axis=(0, 1))
    dxhat = dy * gamma
    c = xf.shape[-1]
    cg = c // groups
    n_per_group = xf.shape[0] * xf.shape[1] * cg
    m1 = jnp.repeat(dxhat.sum(axis=(0, 1)).reshape(groups, cg).sum(axis=1)
                    / n_per_group, cg)[None, None, :]
    m2 = jnp.repeat((dxhat * xhat).sum(axis=(0, 1)).reshape(groups, cg)
                    .sum(axis=1) / n_per_group, cg)[None, None, :]
    dx_ref[0] = (inv * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def group_norm_mish(x, gamma, beta, groups: int = 8):
    """x: (N, H, W, C); gamma/beta: (C,).  Fused GroupNorm(eps=1e-5)+Mish."""
    n, h, w, c = x.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, groups),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(x, gamma[None].astype(jnp.float32), beta[None].astype(jnp.float32))


def _gnm_fwd(x, gamma, beta, groups):
    return group_norm_mish(x, gamma, beta, groups), (x, gamma, beta)


def _gnm_bwd(groups, res, g):
    x, gamma, beta = res
    n, h, w, c = x.shape
    dx, dgamma_p, dbeta_p = pl.pallas_call(
        functools.partial(_bwd_kernel, groups),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
    )(x, gamma[None].astype(jnp.float32), beta[None].astype(jnp.float32), g)
    return dx, dgamma_p[:, 0].sum(axis=0).astype(gamma.dtype), \
        dbeta_p[:, 0].sum(axis=0).astype(beta.dtype)


group_norm_mish.defvjp(_gnm_fwd, _gnm_bwd)


def reference_group_norm_mish(x, gamma, beta, groups: int = 8):
    """Plain-XLA reference implementation (same math) for tests/benchmarks."""
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xhat = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(n, h, w, c)
    y = xhat * gamma + beta
    return _mish(y).astype(x.dtype)
