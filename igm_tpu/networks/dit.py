"""DiT — Diffusion Transformer denoiser (Peebles & Xie 2023), TPU-first.

Beyond-parity backbone: the reference only ships the conv UNet
(`/root/reference/src/models/ddpm.py:170-261`), whose 64-wide convs cap out
at ~41% MFU on v5e (docs/MFU.md — half-filled MXU tiles).  A transformer
over patch tokens is GEMM-dominated end to end, so it is the idiomatic way
to buy MFU headroom on TPU rather than hand-fusing the UNet further.

TPU-first choices (not a torch translation — no torch DiT exists in the
reference):
- widths are multiples of 128 so every GEMM fills whole MXU lanes;
- one fused qkv projection (a single (D, 3D) GEMM) per block;
- bf16 compute with f32 LayerNorm statistics and an f32 output head;
- fixed 2-D sin/cos positional table built at trace time (a constant folded
  into the program — no host transfer, no params);
- static shapes everywhere: patchify/unpatchify are pure reshapes +
  transposes XLA lays out for free next to the embedding GEMMs.

Conditioning is adaLN-Zero: every block's 6 modulation vectors
(shift/scale/gate x attn/mlp) come from a zero-initialised projection of
the (timestep [+ class]) embedding, so each residual branch is exactly
identity at init and the whole network outputs exactly 0 — the property
test anchors on this.

Call signature matches :class:`igm_tpu.networks.unet.Unet`:
``(x NHWC, time (B,), y optional (B,) int)`` -> NHWC prediction, so models
swap backbones with a config knob (``model.network=dit``).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .unet import SinusoidalPosEmb


def _sincos_2d(h: int, w: int, dim: int) -> np.ndarray:
    """Fixed 2-D sin/cos position table, (h*w, dim), f32 numpy (trace-time
    constant).  Half the channels encode the row index, half the column."""
    assert dim % 4 == 0, "DiT width must be divisible by 4 for 2-D sincos"
    quarter = dim // 4
    omega = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter))

    def axis(pos):  # (n,) -> (n, dim//2)
        args = np.outer(pos, omega)
        return np.concatenate([np.sin(args), np.cos(args)], axis=1)

    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    emb = np.concatenate([axis(gy.reshape(-1)), axis(gx.reshape(-1))], axis=1)
    return emb.astype(np.float32)


class _Modulation(nn.Module):
    """adaLN-Zero projection: conditioning -> n_chunks modulation vectors.

    Zero-initialised so every gate/scale/shift starts at 0 (identity
    residual branches, zero output head)."""
    dim: int
    n_chunks: int
    dtype: Any = None

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> tuple:
        m = nn.Dense(self.dim * self.n_chunks, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(nn.silu(c))
        return tuple(jnp.split(m[:, None, :], self.n_chunks, axis=-1))


def _layernorm_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Affine-free LayerNorm with f32 statistics, output in x.dtype."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


class DiTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = None
    # "xla": einsum softmax attention (logits/probs materialised to HBM);
    # "flash": Pallas blockwise online-softmax kernel (probs never leave
    # VMEM).  MEASURED at 768x12/b256 (benchmarks/bench_dit_attn.py,
    # dit_attn_ab round 3): flash 728 ms/step vs XLA 423 — the kernel's
    # (B*H=3072)-cell grid of 128x128x64 block matmuls half-fills the MXU
    # and loses far more than the probs HBM round-trip costs (attention
    # core is ~33% of the XLA step; benchmarks/profiles/dit_trace.json).
    # 9th kernel-vs-XLA decision: XLA stays the default; flash remains the
    # right tool only when token counts grow into the memory-bound regime.
    attn: str = "xla"
    # moe_experts > 0 swaps the dense MLP branch for a Switch-style sparse
    # MoE (networks/moe.py) — the expert-parallel scaling axis.  The
    # load-balance aux loss is sowed into the "moe" collection (picked up
    # by DDPM.train_step when the collection is mutable).
    moe_experts: int = 0
    moe_capacity: float = 1.25
    moe_dispatch: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        d, h = self.dim, self.heads
        hd = d // h
        (s_a, g_a, gate_a, s_m, g_m, gate_m) = _Modulation(
            d, 6, dtype=self.dtype)(c)

        # --- attention branch (one fused qkv GEMM; f32 softmax) ---
        a = _layernorm_f32(x) * (1.0 + g_a) + s_a
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(a)
        # head-grouped feature packing (h, 3*hd): each head's q/k/v is one
        # contiguous 3*hd block of the output axis, so a tensor-parallel
        # shard of the qkv kernel's output features holds WHOLE heads
        # (parallel/mesh.py tp specs) — no cross-shard split traffic.
        # Single-chip it is the same one GEMM + free reshape.  Stays rank-4:
        # a rank-5 (b,n,h,3,hd) view here measurably forces layout copies
        # (same trap as the round-3 linear-attention finding, NOTES.md).
        b, n, _ = qkv.shape
        qkv = qkv.reshape(b, n, h, 3 * hd)
        q = qkv[..., :hd]
        k = qkv[..., hd:2 * hd]
        v = qkv[..., 2 * hd:]
        if self.attn == "flash":
            from ..ops.causal_attention import flash_full_attention
            o = flash_full_attention(q, k, v, sm_scale=1.0 / math.sqrt(hd))
        else:
            def core(q, k, v):
                logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                    preferred_element_type=jnp.float32)
                probs = jax.nn.softmax(logits * (1.0 / math.sqrt(hd)),
                                       axis=-1)
                return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype),
                                  v, preferred_element_type=jnp.float32)
            if self.attn == "remat":
                # recompute logits/probs in the backward instead of
                # stashing the (B,H,S,S) f32 tensor to HBM — the flash
                # memory win at XLA's full-batch GEMM speed
                core = jax.checkpoint(core)
            o = core(q, k, v)
        o = nn.Dense(d, dtype=self.dtype, name="proj")(
            o.astype(self.dtype or jnp.float32).reshape(b, n, d))
        x = x + gate_a * o

        # --- MLP branch (dense, or Switch-MoE when moe_experts > 0) ---
        m = _layernorm_f32(x) * (1.0 + g_m) + s_m
        if self.moe_experts:
            from .moe import SwitchMoE
            m, aux = SwitchMoE(dim=d, hidden=self.mlp_ratio * d,
                               experts=self.moe_experts,
                               capacity_factor=self.moe_capacity,
                               dispatch=self.moe_dispatch,
                               dtype=self.dtype, name="moe")(m)
            # replace-reduce keeps the stored aux a scalar (the default
            # tuple-append would grow the pytree across steps)
            self.sow("moe", "aux", aux,
                     init_fn=lambda: jnp.zeros((), jnp.float32),
                     reduce_fn=lambda prev, cur: cur)
        else:
            m = nn.Dense(self.mlp_ratio * d, dtype=self.dtype)(m)
            m = nn.gelu(m, approximate=True)
            m = nn.Dense(d, dtype=self.dtype)(m)
        return x + gate_m * m


class DiT(nn.Module):
    """Patch-token diffusion transformer.

    ``num_classes > 0`` adds a class embedding table with a trailing *null
    token* row (classifier-free guidance, same recipe as the conditional
    UNet); ``y`` is then required.
    """
    dim: int = 384           # token width — keep a multiple of 128 (MXU lanes)
    depth: int = 8
    heads: int = 6
    patch: int = 2
    channels: int = 3
    mlp_ratio: int = 4
    num_classes: int = 0
    dtype: Any = None        # compute dtype (bfloat16 on TPU)
    remat: bool = False      # jax.checkpoint each block
    # attention path: "auto" == "xla" (measured winner at every DiT shape
    # tried — see DiTBlock.attn); "flash" opts into the Pallas kernel
    # (needs token count % 128 == 0; incompatible with Megatron TP — GSPMD
    # cannot partition a pallas_call over the sharded head axis).
    attn: str = "auto"
    # block parameter layout:
    # - "unroll" (default): DiTBlock_0..depth-1 subtrees — the layout the
    #   Megatron TP specs in parallel/mesh.py match on.
    # - "scan": ONE stacked ``blocks`` param tree ([depth, ...] leaves,
    #   vmapped init) applied via ``lax.scan`` — identical math, O(1)
    #   compiled program size in depth, and the layout pipeline parallelism
    #   shards over the ``stage`` mesh axis.
    block_mode: str = "unroll"
    # GPipe pipeline parallelism (parallel/pipeline.py): a Mesh with a
    # ``stage`` axis routes the (stacked) block stack through
    # ``gpipe_apply``; requires block_mode="scan".  The mesh is a static
    # (trace-time) attribute — retraces when the mesh changes, like any
    # other module hyperparameter.
    pipe_mesh: Any = None
    pipe_microbatches: int = 1
    # Switch-MoE MLPs in every ``moe_every``-th block (0 experts = dense).
    # Expert weights are stacked [E, ...] leaves; parallel/mesh.py shards
    # the E axis over ``model`` in mode="tensor" (expert parallelism).
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity: float = 1.25
    moe_dispatch: str = "auto"
    # sequence parallelism (Megatron-SP composed with TP): a Mesh with a
    # ``model`` axis pins the TOKEN axis of activations to it between
    # blocks, so LayerNorm/modulation/elementwise work and activation
    # memory shard over tokens; GSPMD inserts the all-gather at each qkv /
    # MLP-up GEMM and the reduce-scatter after proj / MLP-down — exactly
    # the Megatron-SP collective pattern, derived from ONE constraint.
    sp_mesh: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, time: jnp.ndarray,
                 y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, hh, ww, cc = x.shape
        p = self.patch
        if hh % p or ww % p:
            raise ValueError(f"image {hh}x{ww} not divisible by patch {p}")
        gh, gw = hh // p, ww // p

        # patchify: (B,H,W,C) -> (B, gh*gw, p*p*C), then embed (one GEMM)
        tok = x.reshape(b, gh, p, gw, p, cc).transpose(0, 1, 3, 2, 4, 5)
        tok = tok.reshape(b, gh * gw, p * p * cc)
        tok = nn.Dense(self.dim, dtype=self.dtype, name="patch_embed")(tok)
        pos = jnp.asarray(_sincos_2d(gh, gw, self.dim))
        tok = tok + pos[None].astype(tok.dtype)

        # conditioning vector: timestep (+ class) embedding
        t = SinusoidalPosEmb(256)(time)
        t = nn.Dense(self.dim, dtype=self.dtype)(t)
        t = nn.silu(t)
        c = nn.Dense(self.dim, dtype=self.dtype)(t)
        if self.num_classes:
            if y is None:
                raise ValueError("conditional DiT (num_classes>0) needs y")
            emb = nn.Embed(self.num_classes + 1, self.dim, name="class_emb",
                           param_dtype=jnp.float32)
            c = c + emb(y.astype(jnp.int32)).astype(c.dtype)

        attn = "xla" if self.attn == "auto" else self.attn
        if attn == "flash" and (gh * gw) % 128:
            raise ValueError(f"attn=flash needs token count % 128 == 0, "
                             f"got {gh * gw}")
        tok = self._sp_constrain(tok)
        if self.block_mode == "scan" or self.pipe_mesh is not None:
            if self.moe_experts:
                raise ValueError("moe_experts needs the unrolled block "
                                 "layout (block_mode='unroll')")
            tok = self._scan_blocks(tok, c, attn)
        else:
            Block = nn.remat(DiTBlock) if self.remat else DiTBlock
            for i in range(self.depth):
                moe = (self.moe_experts if self.moe_experts and
                       (i % max(1, self.moe_every) == self.moe_every - 1)
                       else 0)
                tok = Block(self.dim, self.heads, self.mlp_ratio,
                            dtype=self.dtype, attn=attn, moe_experts=moe,
                            moe_capacity=self.moe_capacity,
                            moe_dispatch=self.moe_dispatch)(tok, c)
                tok = self._sp_constrain(tok)

        # zero-init output head: exact 0 prediction at init
        s_f, g_f = _Modulation(self.dim, 2, dtype=self.dtype)(c)
        tok = _layernorm_f32(tok) * (1.0 + g_f) + s_f
        tok = nn.Dense(p * p * cc, dtype=jnp.float32, name="head",
                       kernel_init=nn.initializers.zeros)(
            tok.astype(jnp.float32))

        # unpatchify back to NHWC
        out = tok.reshape(b, gh, gw, p, p, cc).transpose(0, 1, 3, 2, 4, 5)
        return out.reshape(b, hh, ww, cc)

    def _sp_constrain(self, x: jnp.ndarray) -> jnp.ndarray:
        """Megatron-SP activation constraint: token axis over ``model``.

        One annotation per block boundary is all GSPMD needs — it derives
        the all-gather before each qkv/MLP-up GEMM and turns the TP
        all-reduces after proj/MLP-down into reduce-scatters (the compiled
        program's reduce-scatter presence is asserted in tests)."""
        if self.sp_mesh is None or self.is_initializing():
            return x
        if self.pipe_mesh is not None:
            raise ValueError("sp_mesh and pipe_mesh are mutually exclusive")
        from jax.sharding import NamedSharding, PartitionSpec
        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
        if MODEL_AXIS not in self.sp_mesh.axis_names:
            raise ValueError("sp_mesh needs a 'model' axis")
        data = DATA_AXIS if DATA_AXIS in self.sp_mesh.axis_names else None
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.sp_mesh, PartitionSpec(data, MODEL_AXIS)))

    def _scan_blocks(self, tok: jnp.ndarray, c: jnp.ndarray,
                     attn: str) -> jnp.ndarray:
        """Stacked-parameter block stack: one ``blocks`` param tree with
        ``[depth, ...]`` leaves (vmapped per-block init, so each block draws
        its own init stream like the unrolled layout), applied either as a
        sequential ``lax.scan`` or — when ``pipe_mesh`` carries a ``stage``
        axis — through the GPipe schedule in parallel/pipeline.py."""
        blk = DiTBlock(self.dim, self.heads, self.mlp_ratio,
                       dtype=self.dtype, attn=attn)
        tok_shape, c_shape = tok.shape, c.shape

        def init_stacked(rng):
            td = jnp.zeros((1,) + tok_shape[1:], jnp.float32)
            cd = jnp.zeros((1,) + c_shape[1:], jnp.float32)
            def one(r):
                return blk.init(r, td, cd)["params"]
            return jax.vmap(one)(jax.random.split(rng, self.depth))

        params = self.param("blocks", init_stacked)

        def block_apply(p, x, cc):
            return blk.apply({"params": p}, x, cc)
        if self.remat:
            block_apply = jax.checkpoint(block_apply)

        if self.pipe_mesh is not None and not self.is_initializing():
            from ..parallel.pipeline import (DATA_AXIS, STAGE_AXIS,
                                             gpipe_apply)
            if STAGE_AXIS not in self.pipe_mesh.axis_names:
                raise ValueError("pipe_mesh needs a 'stage' axis")
            n_data = int(self.pipe_mesh.shape.get(DATA_AXIS, 1))
            # the GPipe schedule needs B % (data * microbatches) == 0; other
            # batch shapes (tiny init/eval probes) take the sequential scan —
            # the MATH is identical either way, only the device schedule
            # changes (equality-tested in tests/test_pipeline.py)
            if tok.shape[0] % (n_data * self.pipe_microbatches) == 0:
                return gpipe_apply(block_apply, params, tok, c,
                                   self.pipe_mesh, self.pipe_microbatches)

        def body(x, p):
            return self._sp_constrain(block_apply(p, x, c)), None
        tok, _ = jax.lax.scan(body, tok, params)
        return tok
