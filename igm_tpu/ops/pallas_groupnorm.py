"""Pallas TPU kernel: fused GroupNorm + Mish (DDPM Block epilogue).

SURVEY.md §2.1 names conv+GroupNorm+Mish the Pallas candidate; the conv
belongs to XLA (MXU), so the fusable piece is the norm+gate epilogue —
measured at ~15% of the f32 DDPM step.  One kernel pass per sample computes
group statistics, normalises, applies the affine and the Mish gate with the
activation resident in VMEM (vs XLA's two HBM passes: stats, then apply).

Mosaic constraints shape the implementation: everything stays 2-D
(HW, C) — 1-D→2-D vector reshapes are unsupported — and the per-group
reductions are tiny (C, g) matmuls with a group-membership one-hot.

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


def _group_matrix(c: int, groups: int):
    """(C, g) one-hot of channel->group membership (2-D iota only)."""
    cg = c // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return ((ch // cg) == gr).astype(jnp.float32)


def _stats2d(x2d, groups):
    """x2d: (HW, C) f32 -> ((1, C) mean, (1, C) inv-std) per channel."""
    hw, c = x2d.shape
    cg = c // groups
    m = _group_matrix(c, groups)                       # (C, g)
    n_per_group = hw * cg
    s1 = jnp.sum(x2d, axis=0, keepdims=True)           # (1, C)
    s2 = jnp.sum(x2d * x2d, axis=0, keepdims=True)     # (1, C)
    gm = jnp.dot(s1, m, preferred_element_type=jnp.float32) / n_per_group
    gs2 = jnp.dot(s2, m, preferred_element_type=jnp.float32) / n_per_group
    gv = jnp.maximum(gs2 - gm * gm, 0.0)               # (1, g)
    mean_c = jnp.dot(gm, m.T, preferred_element_type=jnp.float32)
    inv_c = jax.lax.rsqrt(
        jnp.dot(gv, m.T, preferred_element_type=jnp.float32) + 1e-5)
    return mean_c, inv_c                               # (1, C) each


def _group_mean2d(v2d, groups):
    """per-group mean of a (HW, C) array, broadcast back to (1, C)."""
    hw, c = v2d.shape
    cg = c // groups
    m = _group_matrix(c, groups)
    s = jnp.sum(v2d, axis=0, keepdims=True)
    gm = jnp.dot(s, m, preferred_element_type=jnp.float32) / (hw * cg)
    return jnp.dot(gm, m.T, preferred_element_type=jnp.float32)


def _fwd_kernel(groups, x_ref, gamma_ref, beta_ref, o_ref):
    x2d = x_ref[0].astype(jnp.float32)                 # (HW, C)
    mean, inv = _stats2d(x2d, groups)
    y = (x2d - mean) * inv * gamma_ref[:] + beta_ref[:]
    o_ref[0] = _mish(y).astype(o_ref.dtype)


def _bwd_kernel(groups, x_ref, gamma_ref, beta_ref, g_ref,
                dx_ref, dgamma_ref, dbeta_ref):
    x2d = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    gamma = gamma_ref[:]                               # (1, C)
    mean, inv = _stats2d(x2d, groups)
    xhat = (x2d - mean) * inv
    y = xhat * gamma + beta_ref[:]
    dy = g * _mish_grad(y)
    dgamma_ref[0] = jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbeta_ref[0] = jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * gamma
    m1 = _group_mean2d(dxhat, groups)
    m2 = _group_mean2d(dxhat * xhat, groups)
    dx_ref[0] = (inv * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def group_norm_mish(x, gamma, beta, groups: int = 8):
    """x: (N, H, W, C); gamma/beta: (C,).  Fused GroupNorm(eps=1e-5)+Mish."""
    n, h, w, c = x.shape
    x2d = x.reshape(n, h * w, c)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, groups),
        out_shape=jax.ShapeDtypeStruct((n, h * w, c), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(x2d, gamma[None].astype(jnp.float32), beta[None].astype(jnp.float32))
    return out.reshape(x.shape)


def _gnm_fwd(x, gamma, beta, groups):
    return group_norm_mish(x, gamma, beta, groups), (x, gamma, beta)


def _gnm_bwd(groups, res, g):
    x, gamma, beta = res
    n, h, w, c = x.shape
    x2d = x.reshape(n, h * w, c)
    g2d = g.reshape(n, h * w, c)
    dx, dgamma_p, dbeta_p = pl.pallas_call(
        functools.partial(_bwd_kernel, groups),
        out_shape=(
            jax.ShapeDtypeStruct((n, h * w, c), x.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
    )(x2d, gamma[None].astype(jnp.float32), beta[None].astype(jnp.float32),
      g2d)
    return (dx.reshape(x.shape),
            dgamma_p[:, 0].sum(axis=0).astype(gamma.dtype),
            dbeta_p[:, 0].sum(axis=0).astype(beta.dtype))


group_norm_mish.defvjp(_gnm_fwd, _gnm_bwd)


def reference_group_norm_mish(x, gamma, beta, groups: int = 8):
    """Plain-XLA reference implementation (same math) for tests/benchmarks."""
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    mean2 = (xf * xf).mean(axis=(1, 3), keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    xhat = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(n, h, w, c)
    y = xhat * gamma + beta
    return _mish(y).astype(x.dtype)
