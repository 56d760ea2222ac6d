"""Switch-style Mixture-of-Experts MLP for the DiT blocks (TPU-native).

Beyond-parity: the reference has no MoE or expert-parallel story at all
(SURVEY.md §2.2 — its only parallelism is disabled DDP).  This module adds
the standard sparse-MLP scaling axis (Switch Transformer, Fedus et al.
2021) in the idiomatic TPU form:

- routing, dispatch and combine are pure einsums on one-hot masks — no
  gather/scatter, no dynamic shapes, so the whole layer is MXU work XLA
  can partition;
- expert weights are STACKED ``[E, ...]`` leaves; under expert parallelism
  the E axis shards over the ``model`` mesh axis (parallel/mesh.py
  ``_ep_spec``) and GSPMD derives the dispatch/combine collectives from
  the einsum operands' shardings — no hand-written all-to-all;
- capacity is static (``ceil(cf * tokens / E)``): every shape is known at
  trace time, overflow tokens are dropped by the dispatch mask and ride
  the block's residual connection (the Switch paper's behavior).

The router is computed in f32 (softmax stability) with top-1 gating; the
load-balance auxiliary loss ``E * sum_e f_e * p_e`` is returned alongside
the output and surfaced to the train step via ``Module.sow`` from the DiT
block (collection "moe").
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class SwitchMoE(nn.Module):
    dim: int
    hidden: int
    experts: int
    capacity_factor: float = 1.25
    dtype: Any = None
    # dispatch algorithm:
    # - "einsum": one-hot [n, e, cap] dispatch/combine matmuls — the
    #   classic Switch/GLaM TPU form; costs O(n·e·cap·d) ≈ O(n²·d·cf) FLOPs,
    #   fine when tokens ~ width, ruinous when n >> d.  MEASURED at the
    #   DiT-768 trunk (b256 -> n=65k tokens, E=8): the one-hot dispatch
    #   tensor alone is n·e·cap ≈ 5.4G cells — does not even COMPILE on
    #   the v5e (remote-compile 500, benchmarks/dit_moe_round4.jsonl).
    # - "scatter": unique-slot scatter into the [e·cap, d] expert buffer +
    #   gather-combine; O(n·d) data movement, no quadratic matmul.  Slots
    #   are unique by construction (cumsum position within expert), so the
    #   two modes are bit-identical (tests/test_moe.py).  MEASURED: the
    #   full MoE-DiT 768x12/E=8 step runs at 1.86 steps/s, MFU 0.43.
    # - "auto": scatter when n > 4·d (where the dispatch matmuls would
    #   exceed the expert compute), einsum otherwise.
    dispatch: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple:
        """[B, T, d] -> ([B, T, d], aux_loss scalar)."""
        b, t, d = x.shape
        e, n = self.experts, b * t
        cap = max(1, int(math.ceil(self.capacity_factor * n / e)))
        xf = x.reshape(n, d)

        # f32 router; bias-free like the Switch reference implementation
        logits = nn.Dense(e, use_bias=False, name="router",
                          dtype=jnp.float32)(xf.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)               # [n, e]
        gate = jnp.max(probs, axis=-1)                        # [n]
        idx = jnp.argmax(probs, axis=-1)                      # [n]

        onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)    # [n, e]
        # position of each token within its expert's buffer (0-based);
        # tokens past capacity get dispatch weight 0 and fall back to the
        # residual path
        pos = jnp.cumsum(onehot, axis=0) * onehot - onehot
        keep = (pos < cap).astype(jnp.float32) * onehot
        pos_i = jnp.sum(pos * onehot, axis=-1).astype(jnp.int32)  # [n]
        kept = jnp.sum(keep, axis=-1)                             # [n] 0/1

        # stacked expert weights: [E, ...] leading axis is the EP shard axis
        w_up = self.param("w_up", nn.initializers.lecun_normal(),
                          (e, d, self.hidden), jnp.float32)
        b_up = self.param("b_up", nn.initializers.zeros, (e, self.hidden),
                          jnp.float32)
        w_dn = self.param("w_dn", nn.initializers.lecun_normal(),
                          (e, self.hidden, d), jnp.float32)
        b_dn = self.param("b_dn", nn.initializers.zeros, (e, d), jnp.float32)

        cdt = self.dtype or jnp.float32
        mode = self.dispatch
        if mode == "auto":
            mode = "scatter" if n > 4 * d else "einsum"

        if mode == "scatter":
            # unique slot per kept token; dropped tokens land on a dump row
            slot_i = jnp.where(kept > 0, idx * cap + pos_i, e * cap)
            buf = jnp.zeros((e * cap + 1, d), cdt)
            buf = buf.at[slot_i].add(xf.astype(cdt))          # collision-free
            buf = buf[:e * cap].reshape(e, cap, d)
        else:
            slot = jax.nn.one_hot(pos_i, cap, dtype=jnp.float32)  # [n, cap]
            dispatch = keep[:, :, None] * slot[:, None, :]        # [n,e,cap]
            buf = jnp.einsum("nec,nd->ecd", dispatch.astype(cdt),
                             xf.astype(cdt))

        h = jnp.einsum("ecd,edh->ech", buf, w_up.astype(cdt)) + \
            b_up[:, None, :].astype(cdt)
        h = nn.gelu(h, approximate=True)
        out_e = jnp.einsum("ech,ehd->ecd", h, w_dn.astype(cdt)) + \
            b_dn[:, None, :].astype(cdt)

        if mode == "scatter":
            flat = out_e.reshape(e * cap, d)
            picked = jnp.take(flat, jnp.minimum(slot_i, e * cap - 1), axis=0)
            out = picked * (gate * kept)[:, None].astype(cdt)
        else:
            combine = dispatch * gate[:, None, None]          # [n, e, cap]
            out = jnp.einsum("nec,ecd->nd", combine.astype(cdt), out_e)

        # Switch load-balance loss: e * sum_e (fraction routed to e) *
        # (mean router prob of e); == 1 at perfect balance
        frac = jnp.mean(onehot, axis=0)
        mean_p = jnp.mean(probs, axis=0)
        aux = e * jnp.sum(frac * mean_p)
        # router-health observability: per-expert load fractions, sowed
        # into the same "moe" collection the aux loss rides (replace-
        # reduce — the default tuple-append would grow the pytree across
        # steps and break retrace stability).  The train step aggregates
        # these into load-entropy / min-share metrics so router collapse
        # is visible in the TB curves, not just in sample quality.
        self.sow("moe", "load", frac,
                 init_fn=lambda: jnp.zeros((e,), jnp.float32),
                 reduce_fn=lambda prev, cur: cur)
        return out.reshape(b, t, d).astype(x.dtype), aux
