"""Gated PixelCNN (parity: src/models/pixelcnn.py).

Vertical + horizontal masked conv stacks with the v->h connection
(`pixelcnn.py:45-82`), dilation schedule [1,2,1,4,...] (`pixelcnn.py:109-123`),
class conditioning via 1x1 projections of the one-hot label
(`pixelcnn.py:58-62`), 256-way logits + bpd loss.

Masks are applied FUNCTIONALLY (``kernel * mask`` inside the conv) instead of
the reference's in-place ``conv.weight.data *= mask`` every forward
(`pixelcnn.py:23`) — the jit-pure redesign called out in SURVEY.md §7.

Quirk parity: the horizontal gate is tanh*tanh (`pixelcnn.py:76-79`), unlike
the vertical tanh*sigmoid — reproduced as-is.

The per-pixel Python sampling loop (`pixelcnn.py:167-195`) is a ``lax.scan``
over the H*W pixel grid with a full forward per step (static shapes; the
row-truncation trick trades away shape stability, which on TPU costs more
than it saves).
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
from ..networks.base import Conv, make_bias_init, torch_kernel_init
from .base import BaseModel

LOG2 = float(np.log(2.0))


class MaskedConv(nn.Module):
    """Conv with a static (kh, kw) weight mask, torch-parity padding."""
    features: int
    mask: Any  # numpy (kh, kw)
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        kh, kw = self.mask.shape
        pad_h = self.dilation * (kh - 1) // 2
        pad_w = self.dilation * (kw - 1) // 2
        in_f = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init,
                            (kh, kw, in_f, self.features))
        bias = self.param("bias", make_bias_init(in_f * kh * kw),
                          (self.features,))
        mask = jnp.asarray(self.mask, x.dtype)[:, :, None, None]
        out = jax.lax.conv_general_dilated(
            x, kernel * mask, window_strides=(1, 1),
            padding=[(pad_h, pad_h), (pad_w, pad_w)],
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + bias


def vertical_mask(k: int, mask_center: bool) -> np.ndarray:
    m = np.ones((k, k), np.float32)
    m[k // 2 + 1:, :] = 0
    if mask_center:
        m[k // 2] = 0
    return m


def horizontal_mask(k: int, mask_center: bool) -> np.ndarray:
    m = np.ones((1, k), np.float32)
    m[0, k // 2 + 1:] = 0
    if mask_center:
        m[0, k // 2] = 0
    return m


class GatedMaskedConv(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: int = 1
    cond_channel: Optional[int] = None

    @nn.compact
    def __call__(self, vert_x, horiz_x, cond=None):
        c = self.channels
        vert_conv = MaskedConv(2 * c, vertical_mask(self.kernel_size, False),
                               self.dilation)
        horiz_conv = MaskedConv(2 * c, horizontal_mask(self.kernel_size, False),
                                self.dilation)
        vert_conv_x = vert_conv(vert_x)
        v1, v2 = jnp.split(vert_conv_x, 2, axis=-1)
        if cond is None:
            out_vert = jnp.tanh(v1) * jax.nn.sigmoid(v2)
        else:
            pv1 = Conv(c, 1, use_bias=False)(cond)
            pv2 = Conv(c, 1, use_bias=False)(cond)
            out_vert = jnp.tanh(v1 + pv1) * jax.nn.sigmoid(v2 + pv2)
        h_in = horiz_conv(horiz_x) + Conv(2 * c, 1)(vert_conv_x)
        h1, h2 = jnp.split(h_in, 2, axis=-1)
        if cond is None:
            out_horiz = jnp.tanh(h1) * jnp.tanh(h2)  # tanh*tanh quirk
        else:
            ph1 = Conv(c, 1, use_bias=False)(cond)
            ph2 = Conv(c, 1, use_bias=False)(cond)
            out_horiz = jnp.tanh(h1 + ph1) * jnp.tanh(h2 + ph2)
        out_horiz = Conv(c, 1)(out_horiz) + horiz_x
        return out_vert, out_horiz


class PixelCNNNet(nn.Module):
    channels: int
    hidden_dim: int
    n_classes: Optional[int] = None
    class_condition: bool = False

    DILATIONS = (1, 2, 1, 4, 1, 2, 1, 4, 1, 2, 1)

    @nn.compact
    def __call__(self, x, y=None, train: bool = True, pixel=None):
        """x: (N,H,W,C) float; y: (N, n_classes) one-hot or None.

        Returns logits (N, H, W, C, 256); with ``pixel=(hh, ww)`` (traced
        ints) only that position's logits (N, C, 256) — the sampling loop
        needs one pixel per step, and the 1x1 output conv (hidden ->
        256*C over every pixel) is a large share of the forward.
        """
        n = x.shape[0]
        cond = None
        if self.class_condition and y is not None:
            cond = y.reshape(n, 1, 1, self.n_classes)
        v = MaskedConv(self.hidden_dim, vertical_mask(5, True))(x)
        h = MaskedConv(self.hidden_dim, horizontal_mask(5, True))(x)
        for d in self.DILATIONS:
            v, h = GatedMaskedConv(self.hidden_dim, 3, d,
                                   self.n_classes if cond is not None
                                   else None)(v, h, cond)
        conv_out = Conv(self.channels * 256, 1)
        if pixel is not None:
            hh, ww = pixel
            h = jax.lax.dynamic_slice(h, (0, hh, ww, 0),
                                      (n, 1, 1, h.shape[-1]))
            out = conv_out(jax.nn.elu(h))  # (N, 1, 1, C*256)
            out = out.reshape(n, 256, self.channels)
            return jnp.transpose(out, (0, 2, 1))  # (N, C, 256)
        out = conv_out(jax.nn.elu(h))
        # class-major factorisation parity (pixelcnn.py:151-154)
        out = out.reshape(n, x.shape[1], x.shape[2], 256, self.channels)
        return jnp.transpose(out, (0, 1, 2, 4, 3))  # (N,H,W,C,256)


class PixelCNN(BaseModel):
    def __init__(self, datamodule: Any, hidden_dim: int = 64,
                 class_condition: bool = False, n_classes: int = None,
                 lr: float = 1e-3):
        super().__init__(datamodule)
        self.save_hyperparameters(hidden_dim=hidden_dim,
                                  class_condition=class_condition,
                                  n_classes=n_classes, lr=lr)
        # celeba config carries the literal string "None" (SURVEY.md §8);
        # class_condition is never used there, so treat it as 0
        self.n_classes = n_classes if isinstance(n_classes, int) else 0
        self.modules = ModuleDict(
            net=PixelCNNNet(self.channels, hidden_dim,
                            self.n_classes or None, bool(class_condition)))

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        tx = adam(step_lr(hp.lr, 0.99, self.steps_per_epoch))
        self.optimizers = OptimizerSet().add("opt", tx, ["net"])
        y0 = jnp.zeros((1, self.n_classes)) if hp.class_condition else None
        return self.make_state(rng, {"net": (self.dummy_image_batch(1), y0)})

    def _targets(self, imgs):
        if self.input_normalize:
            return ((imgs + 1.0) / 2.0 * 255.0).astype(jnp.int32)
        return (imgs * 255.0).astype(jnp.int32)

    def _bpd(self, logits, targets):
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return nll.reshape(nll.shape[0], -1).mean(axis=1).mean() / LOG2

    def train_step(self, state: TrainState, batch):
        imgs_raw, labels = batch
        state, _rng = state.next_rng()
        imgs = self.preprocess(imgs_raw)
        hp = self.hparams
        y = (jax.nn.one_hot(labels, self.n_classes)
             if hp.class_condition else None)

        def loss_fn(params):
            logits, mut = self.modules.apply("net", params, state.mutables,
                                             imgs, y)
            bpd = self._bpd(logits, self._targets(imgs))
            return bpd, {"metrics": {"train_bpd": bpd},
                         "mutables": {**state.mutables, "net": mut}}

        state, _, aux = self.optimizers.grad_step(state, "opt", loss_fn)
        return bump(state), aux["metrics"]

    # --------------------------------------------------------------- sampling
    def sample_images(self, state: TrainState, rng: jax.Array, n: int,
                      cond=None, init_img=None) -> jnp.ndarray:
        h_dim, w_dim, c_dim = self.height, self.width, self.channels
        img = (jnp.full((n, h_dim, w_dim, c_dim), -1.0)
               if init_img is None else init_img)
        total = h_dim * w_dim
        keys = jax.random.split(rng, total)

        def step(img, xs):
            p, key = xs
            hh, ww = p // w_dim, p % w_dim
            pix, _ = self.modules.apply("net", state.params,
                                        state.mutables, img, cond,
                                        train=False, pixel=(hh, ww))
            draw = jax.random.categorical(key, pix, axis=-1)  # (N, C)
            value = draw.astype(jnp.float32) / 255.0
            if self.input_normalize:
                value = value * 2.0 - 1.0
            cur = jax.lax.dynamic_slice(img, (0, hh, ww, 0),
                                        (n, 1, 1, c_dim)).reshape(n, c_dim)
            new = jnp.where(cur != -1.0, cur, value).reshape(n, 1, 1, c_dim)
            img = jax.lax.dynamic_update_slice(img, new, (0, hh, ww, 0))
            return img, None

        img, _ = jax.lax.scan(step, img, (jnp.arange(total), keys))
        return img

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, labels = batch
        imgs = self.preprocess(imgs_raw)
        hp = self.hparams
        y = (jax.nn.one_hot(labels, self.n_classes)
             if hp.class_condition else None)
        logits, _ = self.modules.apply("net", state.params, state.mutables,
                                       imgs, y, train=False)
        bpd = self._bpd(logits, self._targets(imgs))
        result = {"real_image": imgs}
        if sample:
            if hp.class_condition:
                sample_labels = jnp.tile(jnp.arange(self.n_classes)[:, None],
                                         (1, 8)).reshape(-1)
                sample_y = jax.nn.one_hot(sample_labels, self.n_classes)
                result["fake_image"] = self.sample_images(
                    state, rng, self.n_classes * 8, cond=sample_y)
            else:
                result["fake_image"] = self.sample_images(state, rng,
                                                          imgs.shape[0])
        return result, {"val_bpd": bpd}
