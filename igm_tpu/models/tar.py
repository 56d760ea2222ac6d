"""TAR — Transformer autoregressive over binarized pixels (parity:
src/models/tar.py).

Learned factored H/W positional embeddings + shared first-token embedding
(`tar.py:14-31`); <sos> doubles as the class token when class_cond
(`tar.py:79-83`); causal tril mask (`tar.py:95`); binarisation thresholds
the NORMALIZED pixel at 0.5 (`tar.py:76-77` operates on the transformed
tensor — quirk preserved).  Token-by-token sampling, including
inpainting-from-mask completion (`tar.py:128-145`), is a ``lax.scan`` over
sequence positions with a full causal forward per step (positions > i hold
junk that the mask makes unreachable from position i).

The torch ``nn.TransformerEncoder`` (post-LN, ReLU FFN, dropout 0.1) is
re-implemented as a Flax module; sequences are batch-major (N, S, d) — the
TPU-friendly layout — vs the reference's (S, N, d).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam, step_lr
from ..core.state import TrainState, bump
from ..networks.base import Dense
from .base import BaseModel

LOG2 = float(np.log(2.0))


class TransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer parity: post-norm, ReLU, dropout.

    ``decode=True`` switches the attention to flax's autoregressive KV-cache
    mode: the layer consumes ONE token and attends over cached keys/values —
    O(S) per step instead of the reference's O(S^2) full re-forward
    (`tar.py:137-143`).
    """
    d_model: int
    nhead: int
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Any = None  # compute dtype (bf16 on TPU); params + LN stats f32
    flash: str = "off"  # "off" | "eval" (only when exact) | "always"

    @nn.compact
    def __call__(self, x, mask, train: bool = True, decode: bool = False):
        x = x.astype(self.dtype) if self.dtype is not None else x
        # flash kernel has no attention-probs dropout, so "eval" uses it
        # only when dropout is inactive (exact); "always" opts into
        # dropping attn-prob dropout for train-step speed (documented)
        dropout_active = train and self.dropout > 0.0
        use_flash = (not decode) and (
            self.flash == "always"
            or (self.flash == "eval" and not dropout_active))
        if self.flash == "hashdrop" and not decode:
            # round-3 default on TPU: XLA attention with FUSIBLE hash-based
            # probs dropout — no mask/RNG tensors (see
            # ops/causal_attention.hash_dropout_attention_fn for why this
            # beats a flash kernel at TAR's compute-bound shapes)
            from ..ops.causal_attention import hash_dropout_attention_fn
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, qkv_features=self.d_model,
                dropout_rate=self.dropout, deterministic=not train,
                decode=False, dtype=self.dtype,
                attention_fn=hash_dropout_attention_fn)
        elif self.flash == "dropout" and not decode:
            # round-3 kernel: causal attention + probs dropout fused in
            # VMEM (ops/pallas_dropout_attention.py) — keeps torch's
            # in-attention dropout SEMANTICS (iid Bernoulli on normalised
            # probs) without materialising the (B,H,S,S) probs/mask
            from ..ops.causal_attention import dropout_flash_attention_fn
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, qkv_features=self.d_model,
                dropout_rate=self.dropout, deterministic=not train,
                decode=False, dtype=self.dtype,
                attention_fn=dropout_flash_attention_fn)
        elif use_flash:
            from ..ops.causal_attention import flash_attention_fn
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, qkv_features=self.d_model,
                dropout_rate=0.0, deterministic=True,
                decode=False, dtype=self.dtype,
                attention_fn=flash_attention_fn)
        else:
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, qkv_features=self.d_model,
                dropout_rate=self.dropout, deterministic=not train,
                decode=decode, dtype=self.dtype)
        a = attn(x, x, mask=None if decode else mask)
        a = nn.Dropout(self.dropout, deterministic=not train)(a)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x + a)
        f = Dense(self.dim_feedforward, dtype=self.dtype)(x)
        f = nn.relu(f)
        f = nn.Dropout(self.dropout, deterministic=not train)(f)
        f = Dense(self.d_model, dtype=self.dtype)(f)
        f = nn.Dropout(self.dropout, deterministic=not train)(f)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x + f)


class TARNet(nn.Module):
    n_tokens: int
    d_model: int
    nhead: int
    num_layers: int
    height: int
    width: int
    class_cond: bool
    n_classes: int
    dtype: Any = None  # transformer stack compute dtype; logits head f32
    flash: str = "off"
    dropout: float = 0.1  # torch TransformerEncoderLayer default (parity)

    @nn.compact
    def __call__(self, tokens, train: bool = True, decode: bool = False,
                 pos_idx=None):
        """tokens: (N, S) int32 with S <= 1 + H*W*C -> logits (N, S, n_tokens).

        ``decode=True``: tokens is (N, 1) — the token at sequence position
        ``pos_idx`` — and flax 'cache' collections carry the KV state.
        """
        n, s = tokens.shape
        pixel_embed = nn.Embed(self.n_tokens, self.d_model,
                               embedding_init=nn.initializers.normal(1.0))
        cond_embed = nn.Embed(self.n_classes if self.class_cond else 1,
                              self.d_model,
                              embedding_init=nn.initializers.normal(1.0))
        h_pe = self.param("h_pe", nn.initializers.normal(1.0),
                          (self.height, self.d_model))
        w_pe = self.param("w_pe", nn.initializers.normal(1.0),
                          (self.width, self.d_model))
        first_pe = self.param("first_pe", nn.initializers.normal(1.0),
                              (1, self.d_model))

        # factored positional encodings (tar.py:14-31): position i>0 maps to
        # pixel (i-1) in (h, w) raster order
        h_full = jnp.repeat(h_pe, self.width, axis=0)    # (H*W, d)
        w_full = jnp.tile(w_pe, (self.height, 1))        # (H*W, d)
        pos = jnp.concatenate([first_pe, h_full], axis=0) \
            + jnp.concatenate([first_pe, w_full], axis=0)  # (1+H*W, d)

        if decode:
            # single token at position pos_idx; <sos> embedding iff idx 0
            n_cond = self.n_classes if self.class_cond else 1
            tok = jnp.clip(tokens, 0, None)
            emb_cond = cond_embed(jnp.clip(tok, 0, n_cond - 1))
            emb_pix = pixel_embed(jnp.clip(tok, 0, self.n_tokens - 1))
            emb = jnp.where(pos_idx == 0, emb_cond, emb_pix)
            emb = emb + jax.lax.dynamic_slice_in_dim(pos, pos_idx, 1)[None]
            causal = None
        else:
            emb0 = cond_embed(tokens[:, :1])             # (N, 1, d)
            emb_rest = pixel_embed(tokens[:, 1:])        # (N, S-1, d)
            emb = jnp.concatenate([emb0, emb_rest], axis=1)
            emb = emb + pos[:s][None, :, :]
            causal = jnp.tril(jnp.ones((s, s), bool))

        x = emb
        for _ in range(self.num_layers):
            x = TransformerEncoderLayer(self.d_model, self.nhead, 1024,
                                        dropout=self.dropout,
                                        dtype=self.dtype, flash=self.flash)(
                x, causal, train=train, decode=decode)
        return Dense(self.n_tokens)(x.astype(jnp.float32))


class TAR(BaseModel):
    def __init__(self, datamodule: Any = None, lr: float = 1e-4,
                 b1: float = 0.9, b2: float = 0.999, d_model: int = 256,
                 nhead: int = 4, num_layers: int = 4,
                 class_cond: bool = False, n_classes: int = 10,
                 compute_dtype: str = "auto",
                 flash_attention: Any = "auto", dropout: float = 0.1):
        super().__init__(datamodule)
        self.save_hyperparameters(lr=lr, b1=b1, b2=b2, d_model=d_model,
                                  nhead=nhead, num_layers=num_layers,
                                  class_cond=class_cond, n_classes=n_classes,
                                  compute_dtype=compute_dtype,
                                  flash_attention=flash_attention,
                                  dropout=dropout)
        # bf16 transformer stack on TPU (params f32, logits head + loss f32)
        # — same policy and validation discipline as DDPM (ddpm.py:46-50)
        if compute_dtype == "auto":
            compute_dtype = ("bfloat16" if jax.default_backend() == "tpu"
                             else "float32")
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
        # flash_attention: MEASURED OFF by default — at TAR's shapes
        # (S=785, head_dim=64, 4 heads) XLA's fused mask+softmax attention
        # beats the Pallas flash kernel on TPU (fwd 12.3 vs 13.3 ms, bwd
        # 19.2 vs 37.2 ms; full step 126 vs 217 ms — NOTES.md round 2).
        # The kernel stays available for long-sequence use:
        # true -> always (also drops torch's in-attention dropout);
        # "eval" -> only where exact (attention dropout inactive)
        if flash_attention in (True, "true"):
            flash = "always"
        elif flash_attention == "eval":
            flash = "eval"
        elif flash_attention == "dropout":
            # round-3: fused causal-attention-with-probs-dropout kernel
            # (semantics-preserving flash; see TransformerEncoderLayer)
            flash = "dropout"
        elif flash_attention == "hashdrop":
            flash = "hashdrop"
        else:
            flash = "off"
        if flash not in ("off", "hashdrop") \
                and jax.default_backend() != "tpu":
            import logging
            logging.getLogger(__name__).warning(
                "flash_attention=%s requested but backend is %s — the "
                "Pallas TPU kernel needs a TPU; using the XLA path",
                flash_attention, jax.default_backend())
            flash = "off"
        self.n_tokens = 2  # binary pixels + <sos> shares the cond embedding
        self.seq_len = 1 + self.height * self.width * self.channels
        self.modules = ModuleDict(
            net=TARNet(self.n_tokens, d_model, nhead, num_layers,
                       self.height, self.width, bool(class_cond),
                       int(n_classes), dtype=dtype, flash=flash,
                       dropout=float(dropout)))

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        tx = adam(step_lr(hp.lr, 0.99, self.steps_per_epoch), hp.b1, hp.b2)
        self.optimizers = OptimizerSet().add("opt", tx, ["net"])
        return self.make_state(rng, {
            "net": (jnp.zeros((1, self.seq_len), jnp.int32),)})

    # ---------------------------------------------------------------- tokens
    def img2tokens(self, imgs, labels):
        n = imgs.shape[0]
        binary = (imgs >= 0.5).astype(jnp.int32)  # threshold quirk (tar.py:76)
        toks = binary.reshape(n, -1)  # (h w c) raster order
        if self.hparams.class_cond:
            sos = labels.astype(jnp.int32).reshape(n, 1)
        else:
            sos = jnp.zeros((n, 1), jnp.int32)
        return jnp.concatenate([sos, toks], axis=1)  # (N, S)

    def tokens2img(self, tokens):
        n = tokens.shape[0]
        return tokens[:, 1:].reshape(n, self.height, self.width,
                                     self.channels).astype(jnp.float32)

    def cal_loss(self, params, mutables, tokens, train: bool,
                 rngs: Optional[dict] = None):
        logits, mut = self.modules.apply("net", params, mutables, tokens,
                                         train=train, rngs=rngs)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(logp, tokens[:, 1:, None],
                                   axis=-1)[..., 0]  # (N, S-1)
        return nll.sum(axis=1).mean(), mut

    # ------------------------------------------------------------------ steps
    def train_step(self, state: TrainState, batch):
        imgs_raw, labels = batch
        state, drop_rng = state.next_rng()
        imgs = self.preprocess(imgs_raw)
        tokens = self.img2tokens(imgs, labels)
        denom = self.height * self.width * self.channels

        def loss_fn(params):
            loss, mut = self.cal_loss(params, state.mutables, tokens,
                                      train=True, rngs={"dropout": drop_rng})
            metrics = {"train_log/nll": loss,
                       "train_log/bpd": loss / denom / LOG2}
            return loss, {"metrics": metrics,
                          "mutables": {**state.mutables, "net": mut}}

        state, _, aux = self.optimizers.grad_step(state, "opt", loss_fn)
        return bump(state), aux["metrics"]

    # --------------------------------------------------------------- sampling
    def sample_tokens(self, state: TrainState, rng: jax.Array,
                      init_tokens: jnp.ndarray) -> jnp.ndarray:
        """Fill every -1 position autoregressively (tar.py:137-143).

        KV-cached incremental decoding: each scan step embeds ONE token and
        attends over the cached keys/values — O(S) work per step vs the
        reference's full re-forward O(S^2) (`tar.py:140`).  Cache variables
        come from a decode-mode init over the full sequence length.
        """
        n, s = init_tokens.shape
        net = self.modules["net"]
        cache = net.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((n, s), jnp.int32), train=False, decode=True,
            pos_idx=0)["cache"]
        keys = jax.random.split(rng, s - 1)

        def step(carry, xs):
            cache, tokens = carry
            i, key = xs  # feed token i, predict position i+1
            tok_i = jax.lax.dynamic_slice_in_dim(tokens, i, 1, axis=1)
            logits, upd = net.apply(
                {"params": state.params["net"], "cache": cache},
                jnp.maximum(tok_i, 0), train=False, decode=True, pos_idx=i,
                mutable=["cache"])
            cache = upd["cache"]
            pred = logits[:, 0, :]  # (N, n_tokens)
            draw = jax.random.categorical(key, pred, axis=-1).astype(jnp.int32)
            cur = tokens[:, i + 1]
            new = jnp.where(cur != -1, cur, draw)
            tokens = tokens.at[:, i + 1].set(new)
            return (cache, tokens), None

        (_, tokens), _ = jax.lax.scan(step, (cache, init_tokens),
                                      (jnp.arange(s - 1), keys))
        return tokens

    def sample(self, state: TrainState, rng: jax.Array, n: int,
               labels=None) -> jnp.ndarray:
        tokens = jnp.full((n, self.seq_len), -1, jnp.int32)
        if self.hparams.class_cond and labels is not None:
            tokens = tokens.at[:, 0].set(labels.astype(jnp.int32))
        else:
            tokens = tokens.at[:, 0].set(0)
        tokens = self.sample_tokens(state, rng, tokens)
        return self.tokens2img(tokens)

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, labels = batch
        imgs = self.preprocess(imgs_raw)
        n = imgs.shape[0]
        denom = self.height * self.width * self.channels
        tokens = self.img2tokens(imgs, labels)
        loss, _ = self.cal_loss(state.params, state.mutables, tokens,
                                train=False)
        rand_rng, samp_rng, mask_rng = jax.random.split(rng, 3)
        random_tokens = jax.random.randint(rand_rng, tokens.shape, 0, 2)
        random_tokens = random_tokens.at[:, 0].set(0)
        rand_loss, _ = self.cal_loss(state.params, state.mutables,
                                     random_tokens, train=False)
        metrics = {"val_log/bpd": loss / denom / LOG2,
                   "val_log/rand_bpd": rand_loss / denom / LOG2}
        result = {"real_image": imgs}
        if sample:
            hp = self.hparams
            if hp.class_cond:
                fake_labels = jnp.tile(jnp.arange(hp.n_classes)[:, None],
                                       (1, 8)).reshape(-1)
                fake = self.sample(state, samp_rng, hp.n_classes * 8,
                                   fake_labels)
            else:
                fake = self.sample(state, samp_rng, n)
            # masked-half completion (tar.py:166-167)
            masked = tokens.at[:, 1 + denom // 2:].set(-1)
            mask_tokens = self.sample_tokens(state, mask_rng, masked)
            result["fake_image"] = fake
            result["others"] = {"mask_image": self.tokens2img(mask_tokens)}
        return result, metrics
