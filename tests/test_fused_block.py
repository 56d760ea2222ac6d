"""Fused conv3x3+GroupNorm+Mish kernel (interpret mode) vs XLA reference.

Contract (ops/pallas_fused_block.py): the kernel is bit-level-close to the
exact XLA Block forward (same one-pass f32 GN statistics), including
non-divisible channel/group layouts, odd spatial sizes, bf16 activations,
and multi-tile grids (N > nb).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from igm_tpu.ops.pallas_fused_block import (  # noqa: E402
    fused_block_fwd, xla_block_fwd)


def _mk(n, h, w, ci, co, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=(n, h, w, ci)).astype(dtype)),
            jnp.asarray((rng.normal(size=(3, 3, ci, co)) * 0.1).astype(dtype)),
            jnp.asarray((rng.normal(size=(co,)) * 0.1).astype(np.float32)),
            jnp.asarray((1 + rng.normal(size=(co,)) * 0.1).astype(np.float32)),
            jnp.asarray((rng.normal(size=(co,)) * 0.1).astype(np.float32)))


@pytest.mark.parametrize("n,h,w,ci,co,nb", [
    (4, 8, 8, 16, 16, 2),    # multi-tile grid
    (2, 6, 5, 8, 24, 1),     # odd spatial, cg=3
    (2, 4, 4, 3, 16, 2),     # RGB input channel count
])
def test_fused_block_matches_xla(n, h, w, ci, co, nb):
    x, wt, b, sc, bi = _mk(n, h, w, ci, co)
    out = fused_block_fwd(x, wt, b, sc, bi, groups=8, nb=nb, interpret=True)
    ref = xla_block_fwd(x, wt, b, sc, bi, groups=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_fused_block_bf16_io():
    x, wt, b, sc, bi = _mk(2, 8, 8, 16, 16)
    xb, wb = x.astype(jnp.bfloat16), wt.astype(jnp.bfloat16)
    out = fused_block_fwd(xb, wb, b, sc, bi, groups=8, nb=2, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = xla_block_fwd(xb, wb, b, sc, bi, groups=8)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=0.05)
