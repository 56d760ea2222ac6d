"""MADE — Masked Autoencoder for Distribution Estimation (parity:
src/models/made.py).

Masked MLP over the flattened image with 256-way softmax per pixel; mask
degrees sampled once at construction (`made.py:43-59`, numpy RNG here —
masks are static constants, applied functionally as ``weight * mask`` every
forward instead of the reference's buffer mutation).  Sigmoid between hidden
layers (`made.py:66-70`).  bpd loss (`made.py:96-105`).

The O(H·W) Python sampling loop (`made.py:107-135`) is a ``lax.scan`` over
the pixel index with a full-network forward per step — one compiled program.

NOTE: flattening order is NHWC -> (h w c); the reference flattens torch NCHW
-> (c h w).  Identical for the only configured dataset (MNIST, C=1).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam, apply_updates_sr, step_lr
from ..core.state import TrainState, bump
from ..networks.base import make_bias_init, torch_kernel_init
from .base import BaseModel

LOG2 = float(np.log(2.0))


def build_masks(in_dim: int, hidden_dim: int, n_layer: int, seed: int = 0):
    """Degree-based autoregressive masks (made.py:43-59).

    Returns (hidden_masks, out_mask_small): hidden masks are
    (out_features, in_features); the OUTPUT mask is kept in its compact
    (in_dim, hidden_dim) form — the naive expanded (in_dim*n_class, hidden)
    mask is ~0.8 GB at the reference's sizes and, embedded as an XLA
    constant, exceeded the remote-compile payload limit.
    """
    rng = np.random.default_rng(seed)
    units = [np.arange(in_dim)]
    low = 0
    for _ in range(n_layer):
        hidden = rng.integers(low, in_dim, size=(hidden_dim,))
        units.append(hidden)
        low = int(hidden.min())
    masks = []
    for in_u, out_u in zip(units[:-1], units[1:]):
        masks.append((out_u[:, None] >= in_u[None, :]).astype(np.float32))
    # out_unit for pixel i is (i - 1); connection iff i-1 >= degree(h)
    out_small = (np.arange(in_dim)[:, None] - 1
                 >= units[-1][None, :]).astype(np.float32)  # (in_dim, hidden)
    return masks, out_small


def _zeroed_masked_init(base_init, mask_t_fn):
    """Init wrapper that zeroes the masked entries once, at init time.

    Checkpoints written before this invariant existed are migrated
    automatically on restore — ``MADE.on_restore`` re-applies the masks to
    kernels and Adam moments (idempotent on post-invariant checkpoints).

    This establishes the invariant ``kernel * mask == kernel`` that lets the
    forward pass read the kernel DIRECTLY: re-materialising the masked
    kernel every step is pure HBM traffic (the output layer's expanded
    kernel is 1024x200704 f32 = 822 MB at the reference's MNIST sizes, and
    the step is memory-bound).  ``_grad_mask`` below keeps the invariant
    through training."""
    def init(key, shape, dtype=jnp.float32):
        return base_init(key, shape, dtype) * mask_t_fn().astype(dtype)
    return init


@jax.custom_vjp
def _grad_mask_hidden(kernel, mask_t):
    """Identity on the kernel; cotangent is masked.  With zeroed-masked
    init this is exactly equivalent to ``kernel * mask`` in the forward:
    masked grads stay 0, so adam moments stay 0, so masked weights stay 0."""
    return kernel


def _gmh_fwd(kernel, mask_t):
    return kernel, mask_t


def _gmh_bwd(res, g):
    mask_t = res
    return (g.astype(jnp.float32) * mask_t, jnp.zeros_like(mask_t))


_grad_mask_hidden.defvjp(_gmh_fwd, _gmh_bwd)


@jax.custom_vjp
def _grad_mask_out(kernel, mask_small):
    """Same trick for the (hidden, in_dim*n_class) output kernel, but the
    cotangent multiply broadcasts the COMPACT (in_dim, hidden) mask — the
    expanded mask never exists after init."""
    return kernel


def _gmo_fwd(kernel, mask_small):
    return kernel, (mask_small, kernel.shape)


def _gmo_bwd(res, g):
    mask_small, (hidden, out_f) = res
    in_dim = mask_small.shape[0]
    n_class = out_f // in_dim
    g3 = g.astype(jnp.float32).reshape(hidden, in_dim, n_class)
    gm = (g3 * mask_small.T[:, :, None]).reshape(hidden, out_f)
    # cotangent dtype must match the primal kernel's (bf16 when the output
    # layer stores bf16 weights — MADE.weight_dtype); the mask multiply
    # itself stays f32
    return (gm.astype(g.dtype), jnp.zeros_like(mask_small))


_grad_mask_out.defvjp(_gmo_fwd, _gmo_bwd)


class MaskedLinear(nn.Module):
    mask: Any  # (out, in) numpy array, static
    dtype: Any = None

    def setup(self):
        out_f, in_f = self.mask.shape
        self.kernel = self.param(
            "kernel",
            _zeroed_masked_init(torch_kernel_init,
                                lambda: jnp.asarray(self.mask).T),
            (in_f, out_f))
        self.bias = self.param("bias", make_bias_init(in_f), (out_f,))

    def __call__(self, x):
        w = _grad_mask_hidden(self.kernel, jnp.asarray(self.mask).T)
        if self.dtype is not None:
            y = jax.lax.dot(x.astype(self.dtype), w.astype(self.dtype),
                            preferred_element_type=jnp.float32)
        else:
            y = x @ w
        return y + self.bias


class MaskedPixelOutput(nn.Module):
    """The hidden -> (in_dim x n_class) output layer with the mask kept in
    its compact (in_dim, hidden) form.  The kernel's masked entries are
    zeroed at init and kept zero by ``_grad_mask_out``; the forward is a
    plain (unmasked) GEMM — the expanded masked kernel is never
    materialised (822 MB/step of HBM traffic at reference sizes)."""
    mask_small: Any  # (in_dim, hidden) numpy
    n_class: int
    dtype: Any = None
    param_dtype: Any = jnp.float32  # bf16 = half the W fwd/dgrad/dW traffic

    def setup(self):
        in_dim, hidden = self.mask_small.shape

        def mask_t_expanded():
            m = jnp.asarray(self.mask_small)          # (in_dim, hidden)
            return jnp.repeat(m.T, self.n_class, axis=1)  # (hidden, in*nc)

        self.kernel = self.param(
            "kernel", _zeroed_masked_init(torch_kernel_init, mask_t_expanded),
            (hidden, in_dim * self.n_class), self.param_dtype)
        self.bias = self.param(
            "bias", make_bias_init(hidden), (in_dim * self.n_class,))

    def __call__(self, x):
        in_dim, hidden = self.mask_small.shape
        w = _grad_mask_out(self.kernel, jnp.asarray(self.mask_small))
        if self.dtype is not None:
            y = jax.lax.dot(x.astype(self.dtype), w.astype(self.dtype),
                            preferred_element_type=jnp.float32)
        else:
            y = x @ w
        return (y.reshape(x.shape[0], in_dim, self.n_class)
                + self.bias.reshape(in_dim, self.n_class))

    def pixel(self, x, i):
        """(N, hidden), pixel index -> (N, n_class) logits for pixel i."""
        in_dim, hidden = self.mask_small.shape
        m_i = jax.lax.dynamic_slice_in_dim(jnp.asarray(self.mask_small), i,
                                           1, axis=0)[0]     # (hidden,)
        w = self.kernel.reshape(hidden, in_dim, self.n_class)
        w_i = jax.lax.dynamic_slice_in_dim(w, i, 1, axis=1)[:, 0]
        b_i = jax.lax.dynamic_slice_in_dim(
            self.bias.reshape(in_dim, self.n_class), i, 1, axis=0)[0]
        return (x * m_i) @ w_i + b_i


class MADENet(nn.Module):
    in_dim: int
    hidden_dim: int
    n_class: int
    n_layer: int
    mask_seed: int = 0
    dtype: Any = None
    out_param_dtype: Any = jnp.float32

    def setup(self):
        hidden_masks, out_small = build_masks(
            self.in_dim, self.hidden_dim, self.n_layer, self.mask_seed)
        self.layers = [MaskedLinear(m, dtype=self.dtype)
                       for m in hidden_masks]
        self.out_layer = MaskedPixelOutput(out_small, self.n_class,
                                           dtype=self.dtype,
                                           param_dtype=self.out_param_dtype)

    def __call__(self, x_flat, train: bool = True):
        """x_flat: (N, D) floats -> logits (N, D, n_class)."""
        x = x_flat
        for layer in self.layers:
            x = jax.nn.sigmoid(layer(x))
        return self.out_layer(x)

    def pixel_logits(self, x_flat, i):
        """Logits for pixel ``i`` only: hidden layers run in full, the huge
        output layer (hidden -> D*n_class, ~99% of the FLOPs at the
        reference's hidden_dim=1024) is sliced to this pixel."""
        x = x_flat
        for layer in self.layers:
            x = jax.nn.sigmoid(layer(x))
        return self.out_layer.pixel(x, i)


class MADE(BaseModel):
    def __init__(self, datamodule: Any, hidden_dim: int = 1024,
                 n_layer: int = 3, lr: float = 1e-3,
                 compute_dtype: str = "auto", weight_dtype: str = "auto"):
        super().__init__(datamodule)
        self.save_hyperparameters(hidden_dim=hidden_dim, n_layer=n_layer,
                                  lr=lr, compute_dtype=compute_dtype,
                                  weight_dtype=weight_dtype)
        self.in_dim = self.width * self.height * self.channels
        # bf16 GEMM operands on TPU (optimizer stays f32-math; logits
        # accumulate in f32 via preferred_element_type) — same policy and
        # validation discipline as DDPM's compute_dtype (ddpm.py:46-50)
        if compute_dtype == "auto":
            compute_dtype = ("bfloat16" if jax.default_backend() == "tpu"
                             else "float32")
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
        # weight_dtype=bfloat16 STORES the output-layer kernel in bf16 with
        # stochastic-rounded updates (core/optim.apply_updates_sr) — the
        # step is HBM-bound on that 822 MB layer's traffic (docs/MFU_AR.md)
        # and W's fwd+dgrad+dW legs are ~45% of the minimal 6.6 GB step.
        # Measured round 4 (benchmarks/made_wdtype_ab.py, b128, 100 steps):
        # 65.7 -> 76.9 steps/s (+17%), bpd trajectory within 5e-5 of f32 at
        # every checkpoint (counter-hash SR noise fuses — an RngBitGenerator
        # stream erased the win).  DEFAULT ON where compute is bf16 (TPU);
        # f32 checkpoints restore into the bf16 template (orbax casts).
        # "auto" honors IGM_MADE_WDTYPE (A/B lever).
        if weight_dtype == "auto":
            weight_dtype = os.environ.get(
                "IGM_MADE_WDTYPE",
                "bfloat16" if dtype is not None else "float32")
        self._bf16_weights = (weight_dtype == "bfloat16"
                              and dtype is not None)
        out_pdtype = jnp.bfloat16 if self._bf16_weights else jnp.float32
        self.modules = ModuleDict(
            net=MADENet(self.in_dim, hidden_dim, n_class=256,
                        n_layer=n_layer, dtype=dtype,
                        out_param_dtype=out_pdtype))

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        # bf16 moments: the step is HBM-bound on the 822 MB output layer's
        # optimizer traffic.  mu bf16: +7% (round 2); nu bf16: +8% more
        # (round 3, 60.5 -> 65.4 steps/s; 100-step bpd trajectory within
        # 0.005 of f32 at every checkpoint — benchmarks/profiles/ and
        # NOTES.md).  Both ride only when compute is bf16 (TPU).
        moment_dtype = (jnp.bfloat16 if self.modules["net"].dtype is not None
                        else None)
        tx = adam(step_lr(hp.lr, 0.99, self.steps_per_epoch),
                  mu_dtype=moment_dtype, nu_dtype=moment_dtype)
        self.optimizers = OptimizerSet().add("opt", tx, ["net"])
        return self.make_state(rng, {"net": (jnp.zeros((1, self.in_dim)),)})

    def on_restore(self, state: TrainState) -> TrainState:
        """Migrate pre-invariant checkpoints: re-zero masked kernel entries
        AND the corresponding Adam moments (else the optimizer would push
        nonzero masked weights back in, silently breaking autoregressive
        causality).  The mask-multiply is idempotent, so post-invariant
        checkpoints pass through unchanged."""
        hp = self.hparams
        hidden_masks, out_small = build_masks(self.in_dim, hp.hidden_dim,
                                              hp.n_layer, seed=0)
        masks = {f"layers_{i}": jnp.asarray(m.T)       # (in_f, out_f)
                 for i, m in enumerate(hidden_masks)}
        masks["out_layer"] = jnp.asarray(
            np.repeat(out_small.T, 256, axis=1))       # (hidden, D*256)

        def fix(path, leaf):
            keys = {getattr(p, "key", getattr(p, "name", None)) for p in path}
            if "kernel" in keys:
                for name, m in masks.items():
                    if name in keys and leaf.shape == m.shape:
                        return leaf * m.astype(leaf.dtype)
            return leaf

        return state.replace(
            params=jax.tree_util.tree_map_with_path(fix, state.params),
            opt_states=jax.tree_util.tree_map_with_path(fix,
                                                        state.opt_states))

    # ---------------------------------------------------------------- helpers
    def _flatten(self, imgs):
        return imgs.reshape(imgs.shape[0], -1)

    def _targets(self, imgs_flat):
        if self.input_normalize:
            return ((imgs_flat + 1.0) / 2.0 * 255.0).astype(jnp.int32)
        return (imgs_flat * 255.0).astype(jnp.int32)

    def _bpd(self, logits, targets):
        logp = jax.nn.log_softmax(logits, axis=-1)
        # one-hot contraction, NOT take_along_axis: the gather forced an
        # 822 MB layout copy of the logits tensor on TPU (2.5 ms of the
        # 16.8 ms step, round-3 trace benchmarks/profiles/made_trace.md);
        # the exact-equivalent one-hot sum fuses into the softmax reduction
        # (same fix as pixelcnn.py:390)
        nll = -(logp * jax.nn.one_hot(targets, logp.shape[-1],
                                      dtype=logp.dtype)).sum(-1)
        return nll.mean(axis=1).mean() / LOG2

    # ------------------------------------------------------------------ steps
    def train_step(self, state: TrainState, batch):
        imgs_raw, _ = batch
        state, _rng = state.next_rng()
        imgs = self._flatten(self.preprocess(imgs_raw))
        targets = self._targets(imgs)

        def loss_fn(params):
            logits, mut = self.modules.apply("net", params, state.mutables,
                                             imgs)
            bpd = self._bpd(logits, targets)
            return bpd, {"metrics": {"train_bpd": bpd},
                         "mutables": {**state.mutables, "net": mut}}

        # IGM_MADE_SR=0: measurement-only arm (round-to-nearest apply) to
        # isolate the HBM cost of the SR noise stream; NOT for training
        # (RTN stagnates bf16 weights once |update| < ulp/2)
        use_sr = os.environ.get("IGM_MADE_SR", "1") == "1"
        apply_fn = (apply_updates_sr(_rng)
                    if (self._bf16_weights and use_sr) else None)
        state, _, aux = self.optimizers.grad_step(state, "opt", loss_fn,
                                                  apply_fn=apply_fn)
        return bump(state), aux["metrics"]

    # --------------------------------------------------------------- sampling
    def sample_images(self, state: TrainState, rng: jax.Array, n: int,
                      init_flat: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """lax.scan over pixel index; -1 entries are (re)generated, parity
        with the reference's fill-the-minus-ones contract (made.py:107)."""
        d = self.in_dim
        img = jnp.full((n, d), -1.0) if init_flat is None else init_flat
        keys = jax.random.split(rng, d)

        def step(carry, xs):
            img = carry
            i, key = xs
            pix_logits = self.modules["net"].apply(
                {"params": state.params["net"]}, img, i,
                method=MADENet.pixel_logits)  # (N, 256)
            draw = jax.random.categorical(key, pix_logits, axis=-1)
            value = draw.astype(jnp.float32) / 255.0
            if self.input_normalize:
                value = value * 2.0 - 1.0
            keep = img[:, i] != -1.0
            new_col = jnp.where(keep, img[:, i], value)
            img = img.at[:, i].set(new_col)
            return img, None

        img, _ = jax.lax.scan(step, img, (jnp.arange(d), keys))
        return img.reshape(n, self.height, self.width, self.channels)

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, _ = batch
        imgs = self._flatten(self.preprocess(imgs_raw))
        targets = self._targets(imgs)
        logits, _ = self.modules.apply("net", state.params, state.mutables,
                                       imgs, train=False)
        bpd = self._bpd(logits, targets)
        result = {"real_image": self.preprocess(imgs_raw)}
        if sample:
            result["fake_image"] = self.sample_images(state, rng,
                                                      imgs.shape[0])
        return result, {"val_bpd": bpd}
