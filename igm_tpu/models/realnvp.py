"""RealNVP normalizing flow (beyond parity).

The reference zoo (SURVEY.md §2) spans GANs, VAEs, autoregressive and
diffusion models but has no exact-likelihood flow; RealNVP (Dinh et al.
2017, "Density estimation using Real NVP") completes the classic family
set.  Architecture: uniform dequantization + logit transform, then a
multi-scale stack of affine coupling layers —

    checkerboard x n  ->  squeeze (H,W,C)->(H/2,W/2,4C)  ->
    channel x n       ->  checkerboard x n (at half resolution)

Each coupling leaves the masked half unchanged and applies an affine map
``x * exp(s) + t`` to the rest, where (s, t) come from a small convnet of
the masked half — so both directions are a single batched conv stack and
the Jacobian log-determinant is just ``sum(s)``.  Exact bits-per-dim:

    bpd = -(log N(z) + sum logdet) / (D ln 2) + 8

TPU-first notes: everything (both flow directions, the bpd loss, the
sampler) is a fixed stack of NHWC convs — pure MXU work, no scans, no
gathers.  The final coupling conv is zero-initialized so the whole flow
starts as the identity (standard RealNVP/Glow practice: stable early
optimization and an exactly-known init bpd).
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam
from ..core.state import TrainState, bump
from ..networks.base import Conv
from .base import BaseModel

LOG2 = math.log(2.0)


def squeeze(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H/2,W/2,4C) space-to-depth."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def unsqueeze(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * 2, w * 2, c)


class CouplingNet(nn.Module):
    """(s, t) head: 3-layer convnet, zero-init output => identity flow at
    init.  ``log s`` is bounded by a learned per-channel scale times tanh
    (the standard RealNVP stabilisation)."""
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = x.shape[-1]
        h = nn.relu(Conv(self.hidden, 3, padding=1)(x))
        h = nn.relu(Conv(self.hidden, 1)(h))
        out = nn.Conv(2 * c, (3, 3), padding="SAME",
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros)(h)
        raw_s, t = jnp.split(out, 2, axis=-1)
        s_scale = self.param("s_scale", nn.initializers.ones, (c,))
        return s_scale * jnp.tanh(raw_s), t


class AffineCoupling(nn.Module):
    """One masked affine coupling (RealNVP eq. 7-8); ``parity`` flips which
    half is conditioned on."""
    hidden: int
    mask_type: str  # "check" | "chan"
    parity: int

    def setup(self):
        self.net = CouplingNet(self.hidden)

    def _mask(self, x: jnp.ndarray) -> jnp.ndarray:
        _, h, w, c = x.shape
        if self.mask_type == "check":
            hh = jnp.arange(h).reshape(1, h, 1, 1)
            ww = jnp.arange(w).reshape(1, 1, w, 1)
            return ((hh + ww + self.parity) % 2).astype(x.dtype)
        half = (jnp.arange(c) < c // 2).astype(x.dtype)
        b = half if self.parity == 0 else 1.0 - half
        return b.reshape(1, 1, 1, c)

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = self._mask(x)
        log_s, t = self.net(x * b)
        log_s = log_s * (1.0 - b)
        t = t * (1.0 - b)
        z = x * b + (1.0 - b) * (x * jnp.exp(log_s) + t)
        return z, log_s.sum(axis=(1, 2, 3))

    def inverse(self, z: jnp.ndarray) -> jnp.ndarray:
        b = self._mask(z)
        log_s, t = self.net(z * b)
        log_s = log_s * (1.0 - b)
        t = t * (1.0 - b)
        return z * b + (1.0 - b) * (z - t) * jnp.exp(-log_s)


class RealNVPFlow(nn.Module):
    """Full multi-scale flow; ``__call__`` maps data-space -> latent
    (returning the summed logdet), ``inverse`` maps latent -> data."""
    hidden: int = 64
    n_check: int = 3
    n_chan: int = 3
    n_final: int = 3

    def setup(self):
        self.check1 = [AffineCoupling(self.hidden, "check", i % 2)
                       for i in range(self.n_check)]
        self.chan = [AffineCoupling(self.hidden, "chan", i % 2)
                     for i in range(self.n_chan)]
        self.check2 = [AffineCoupling(self.hidden, "check", i % 2)
                       for i in range(self.n_final)]

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        logdet = jnp.zeros((x.shape[0],), jnp.float32)
        for c in self.check1:
            x, ld = c(x)
            logdet += ld
        x = squeeze(x)
        for c in list(self.chan) + list(self.check2):
            x, ld = c(x)
            logdet += ld
        return x, logdet

    def inverse(self, z: jnp.ndarray) -> jnp.ndarray:
        for c in list(self.check2)[::-1] + list(self.chan)[::-1]:
            z = c.inverse(z)
        z = unsqueeze(z)
        for c in list(self.check1)[::-1]:
            z = c.inverse(z)
        return z


class RealNVP(BaseModel):
    def __init__(self, datamodule: Any, hidden_dim: int = 64,
                 n_couplings: Sequence[int] = (3, 3, 3), lr: float = 1e-3,
                 b1: float = 0.9, b2: float = 0.999, alpha: float = 0.05,
                 sample_batch: int = 64, grad_clip: float = 50.0, **kwargs):
        super().__init__(datamodule)
        if self.height % 2 or self.width % 2:
            raise ValueError("RealNVP squeeze needs even H and W "
                             f"(got {self.height}x{self.width})")
        self.save_hyperparameters(hidden_dim=hidden_dim,
                                  n_couplings=list(n_couplings), lr=lr,
                                  b1=b1, b2=b2, alpha=alpha,
                                  sample_batch=sample_batch,
                                  grad_clip=grad_clip)
        nc = list(n_couplings)
        self.modules = ModuleDict(flow=RealNVPFlow(
            hidden=hidden_dim, n_check=nc[0], n_chan=nc[1], n_final=nc[2]))
        self.dims = self.height * self.width * self.channels

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        # global-norm clip ahead of Adam: the exp(s) couplings can spike
        # early-training gradients (standard flow-training practice)
        import optax
        opt = optax.chain(optax.clip_by_global_norm(float(hp.grad_clip)),
                          adam(hp.lr, hp.b1, hp.b2))
        self.optimizers = OptimizerSet().add("opt", opt, ["flow"])
        return self.make_state(rng, {"flow": (self.dummy_image_batch(1),)})

    # ----------------------------------------------------------- data <-> z0
    def _to_unit(self, imgs_raw) -> jnp.ndarray:
        """Model-input space -> [0,1) pixel space (pre-dequant)."""
        x = self.preprocess(imgs_raw)
        return (x + 1.0) / 2.0 if self.input_normalize else x

    def _logit_forward(self, y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Dequantized y in (0,1) -> logit space, with per-sample logdet."""
        a = float(self.hparams.alpha)
        q = a + (1.0 - 2.0 * a) * y
        z0 = jnp.log(q) - jnp.log1p(-q)
        logdet = (math.log(1.0 - 2.0 * a) - jnp.log(q) - jnp.log1p(-q)
                  ).sum(axis=(1, 2, 3))
        return z0, logdet

    def _logit_inverse(self, z0: jnp.ndarray) -> jnp.ndarray:
        a = float(self.hparams.alpha)
        return jnp.clip((jax.nn.sigmoid(z0) - a) / (1.0 - 2.0 * a), 0.0, 1.0)

    # ------------------------------------------------------------------ train
    def _bpd(self, params, mutables, imgs_raw, u_rng):
        """Exact dequantized bits/dim: -(log N(z) + logdets)/(D ln2) + 8."""
        y01 = self._to_unit(imgs_raw)
        u = jax.random.uniform(u_rng, y01.shape)
        y = (y01 * 255.0 + u) / 256.0
        z0, ld_pre = self._logit_forward(y)
        (z, ld_flow), mut = self.modules.apply("flow", params, mutables, z0)
        log_prior = -0.5 * (z ** 2 + math.log(2.0 * math.pi)).sum(
            axis=(1, 2, 3))
        bpd = (-(log_prior + ld_flow + ld_pre) / (self.dims * LOG2) + 8.0)
        return bpd.mean(), mut

    def train_step(self, state: TrainState, batch):
        imgs_raw, _ = batch
        state, u_rng = state.next_rng()

        def loss_fn(params):
            bpd, mut = self._bpd(params, state.mutables, imgs_raw, u_rng)
            return bpd, {"metrics": {"train_bpd": bpd},
                         "mutables": {**state.mutables, "flow": mut}}

        state, _, aux = self.optimizers.grad_step(state, "opt", loss_fn)
        return bump(state), aux["metrics"]

    # --------------------------------------------------------------- sampling
    def sample(self, state: TrainState, rng: jax.Array, n: int) -> jnp.ndarray:
        z = jax.random.normal(
            rng, (n, self.height // 2, self.width // 2, 4 * self.channels))
        z0, _ = self.modules.apply("flow", state.params, state.mutables, z,
                                   train=False, method="inverse")
        y = self._logit_inverse(z0)
        return y * 2.0 - 1.0 if self.input_normalize else y

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, _ = batch
        u_rng, sample_rng = jax.random.split(rng)
        bpd, _ = self._bpd(state.params, state.mutables, imgs_raw, u_rng)
        result = {"real_image": self.preprocess(imgs_raw)}
        if sample:
            result["fake_image"] = self.sample(
                state, sample_rng, int(self.hparams.sample_batch))
        return result, {"val_bpd": bpd}
