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

FAST SAMPLING (TPU-native redesign of the reference's per-pixel full
re-forward, `pixelcnn.py:167-195`): the vertical stack is row-causal — every
vertical activation at row r depends only on input rows < r (initial k5
vconv has mask_center=True; inner vconvs only extend downward-causally) —
so it is recomputed ONCE PER ROW for the whole image; within a row the
horizontal stack is column-causal with at most 2 left taps per layer, so an
inner scan advances one pixel per step at O(C^2) cost.  Total sampling work
drops from H*W full forwards to ~H vertical passes + H*W cheap column
steps (~25-50x fewer FLOPs at 28x28).  Exact-logits equivalence with the
full forward is asserted in tests/test_causality.py.
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
from ..networks.base import make_bias_init, torch_kernel_init
from .base import BaseModel

LOG2 = float(np.log(2.0))


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


class MaskedConv(nn.Module):
    """Conv with a static (kh, kw) weight mask, torch-parity padding.

    setup-style so the sampling path can reuse the kernel for single-pixel
    tap contractions (``h_taps``)."""
    features: int
    mask: Any  # numpy (kh, kw)
    dilation: int = 1
    in_features: int = 0  # required (setup-style params need static shapes)

    def setup(self):
        kh, kw = self.mask.shape
        self.kernel = self.param("kernel", torch_kernel_init,
                                 (kh, kw, self.in_features, self.features))
        self.bias = self.param("bias",
                               make_bias_init(self.in_features * kh * kw),
                               (self.features,))

    def __call__(self, x):
        kh, kw = self.mask.shape
        pad_h = self.dilation * (kh - 1) // 2
        pad_w = self.dilation * (kw - 1) // 2
        mask = jnp.asarray(self.mask, x.dtype)[:, :, None, None]
        out = jax.lax.conv_general_dilated(
            x, self.kernel * mask, window_strides=(1, 1),
            padding=[(pad_h, pad_h), (pad_w, pad_w)],
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + self.bias

    def n_left_taps(self) -> int:
        """Number of unmasked kernel columns (for 1 x k horizontal masks)."""
        return int(self.mask[0].sum())

    def h_taps(self, taps: jnp.ndarray) -> jnp.ndarray:
        """taps: (N, T, C) — input values at the T unmasked tap positions
        (left to right); returns (N, features).  Only valid for 1-row
        (horizontal) masks."""
        t = taps.shape[1]
        sub = self.kernel[0, :t]  # (T, C, F); masked-out columns are > these
        return jnp.einsum("ntc,tcf->nf", taps, sub) + self.bias


class Pointwise(nn.Module):
    """1x1 conv as a dense map, usable on (N, H, W, C) or (N, C)."""
    features: int
    in_features: int
    use_bias: bool = True

    def setup(self):
        self.kernel = self.param("kernel", torch_kernel_init,
                                 (1, 1, self.in_features, self.features))
        if self.use_bias:
            self.bias = self.param("bias", make_bias_init(self.in_features),
                                   (self.features,))

    def __call__(self, x):
        out = jnp.einsum("...c,cf->...f", x, self.kernel[0, 0])
        if self.use_bias:
            out = out + self.bias
        return out


class GatedMaskedConv(nn.Module):
    """(pixelcnn.py:45-82) — full __call__ plus incremental sub-paths."""
    channels: int
    kernel_size: int = 3
    dilation: int = 1
    cond_channel: Optional[int] = None

    def setup(self):
        c = self.channels
        self.vert_conv = MaskedConv(2 * c, vertical_mask(self.kernel_size, False),
                                    self.dilation, in_features=c)
        self.horiz_conv = MaskedConv(2 * c, horizontal_mask(self.kernel_size, False),
                                     self.dilation, in_features=c)
        self.conv1x1_1 = Pointwise(2 * c, 2 * c)
        self.conv1x1_2 = Pointwise(c, c)
        if self.cond_channel is not None:
            self.cond_proj_vert1 = Pointwise(c, self.cond_channel, use_bias=False)
            self.cond_proj_vert2 = Pointwise(c, self.cond_channel, use_bias=False)
            self.cond_proj_horiz1 = Pointwise(c, self.cond_channel, use_bias=False)
            self.cond_proj_horiz2 = Pointwise(c, self.cond_channel, use_bias=False)

    # ------------------------------------------------------------- full path
    def vert_part(self, vert_x, cond=None):
        """Returns (out_vert, vert_conv_x) — the row-causal half."""
        vert_conv_x = self.vert_conv(vert_x)
        v1, v2 = jnp.split(vert_conv_x, 2, axis=-1)
        if cond is None:
            out_vert = jnp.tanh(v1) * jax.nn.sigmoid(v2)
        else:
            out_vert = (jnp.tanh(v1 + self.cond_proj_vert1(cond))
                        * jax.nn.sigmoid(v2 + self.cond_proj_vert2(cond)))
        return out_vert, vert_conv_x

    def horiz_gate(self, h_in, cond=None):
        h1, h2 = jnp.split(h_in, 2, axis=-1)
        if cond is None:
            return jnp.tanh(h1) * jnp.tanh(h2)  # tanh*tanh quirk
        return (jnp.tanh(h1 + self.cond_proj_horiz1(cond))
                * jnp.tanh(h2 + self.cond_proj_horiz2(cond)))

    def __call__(self, vert_x, horiz_x, cond=None):
        out_vert, vert_conv_x = self.vert_part(vert_x, cond)
        h_in = self.horiz_conv(horiz_x) + self.conv1x1_1(vert_conv_x)
        out_horiz = self.horiz_gate(h_in, cond)
        out_horiz = self.conv1x1_2(out_horiz) + horiz_x
        return out_vert, out_horiz

    # ------------------------------------------------------ incremental path
    def horiz_step(self, vert_conv_x_px, h_taps, h_center, cond_px=None):
        """One-pixel horizontal update.
        vert_conv_x_px: (N, 2C) — vert_conv output at this pixel;
        h_taps: (N, T, C) — this layer's h-input at its unmasked taps
        (T includes the center; rightmost tap IS the center);
        h_center: (N, C) — this layer's h-input at the pixel (residual).
        """
        h_in = self.horiz_conv.h_taps(h_taps) + self.conv1x1_1(vert_conv_x_px)
        out = self.horiz_gate(h_in, cond_px)
        return self.conv1x1_2(out) + h_center


class PixelCNNNet(nn.Module):
    channels: int
    hidden_dim: int
    n_classes: Optional[int] = None
    class_condition: bool = False

    DILATIONS = (1, 2, 1, 4, 1, 2, 1, 4, 1, 2, 1)

    def setup(self):
        cond_ch = self.n_classes if self.class_condition else None
        self.conv_vstack = MaskedConv(self.hidden_dim, vertical_mask(5, True),
                                      in_features=self.channels)
        self.conv_hstack = MaskedConv(self.hidden_dim, horizontal_mask(5, True),
                                      in_features=self.channels)
        self.conv_layers = [
            GatedMaskedConv(self.hidden_dim, 3, d, cond_ch)
            for d in self.DILATIONS
        ]
        self.conv_out = Pointwise(self.channels * 256, self.hidden_dim)

    def _cond4d(self, y):
        if self.class_condition and y is not None:
            return y.reshape(y.shape[0], 1, 1, self.n_classes)
        return None

    def __call__(self, x, y=None, train: bool = True, pixel=None):
        """x: (N,H,W,C) float; y: (N, n_classes) one-hot or None.

        Returns logits (N, H, W, C, 256); with ``pixel=(hh, ww)`` (traced
        ints) only that position's logits (N, C, 256)."""
        n = x.shape[0]
        cond = self._cond4d(y)
        v = self.conv_vstack(x)
        h = self.conv_hstack(x)
        for layer in self.conv_layers:
            v, h = layer(v, h, cond)
        if pixel is not None:
            hh, ww = pixel
            h = jax.lax.dynamic_slice(h, (0, hh, ww, 0),
                                      (n, 1, 1, h.shape[-1]))
            out = self.conv_out(jax.nn.elu(h)).reshape(n, 256, self.channels)
            return jnp.transpose(out, (0, 2, 1))  # (N, C, 256)
        out = self.conv_out(jax.nn.elu(h))
        # class-major factorisation parity (pixelcnn.py:151-154)
        out = out.reshape(n, x.shape[1], x.shape[2], 256, self.channels)
        return jnp.transpose(out, (0, 1, 2, 4, 3))  # (N,H,W,C,256)

    # --------------------------------------------------- fast-sampling parts
    def vert_features(self, x, y=None):
        """Row-causal precompute: per-layer vert_conv outputs (list of
        (N,H,W,2C)); valid at row r whenever input rows < r are final."""
        cond = self._cond4d(y)
        v = self.conv_vstack(x)
        outs = []
        for layer in self.conv_layers:
            out_vert, vert_conv_x = layer.vert_part(v, cond)
            outs.append(vert_conv_x)
            v = out_vert
        return outs

    def sample_rows(self, img, rng, normalize: bool, y=None):
        """Fast sampler: outer scan over rows (one vertical pass each),
        inner scan over columns (O(C^2) horizontal step + draw).  Pixels
        already != -1 are kept (inpainting contract, pixelcnn.py:178)."""
        n, h_dim, w_dim, _ = img.shape
        cond4 = self._cond4d(y)
        cond_px = (y if (self.class_condition and y is not None) else None)
        n_layers = len(self.conv_layers)
        hid = self.hidden_dim
        row_keys = jax.random.split(rng, h_dim)

        def gather_taps(buf_lw, w, offsets):
            """buf_lw: (N, W, C'); values at w+offsets, zero outside."""
            cols = []
            for off in offsets:
                idx = w + off
                valid = idx >= 0
                col = jax.lax.dynamic_slice_in_dim(
                    buf_lw, jnp.maximum(idx, 0), 1, axis=1)[:, 0]
                cols.append(jnp.where(valid, col, 0.0))
            return jnp.stack(cols, axis=1)  # (N, T, C')

        def row_step(img, xs):
            row, row_key = xs
            # vertical stack over the whole image; row r depends only on
            # rows < r, which are final by raster order
            v = self.conv_vstack(img)
            vert_rows = []
            for layer in self.conv_layers:
                out_vert, vert_conv_x = layer.vert_part(v, cond4)
                vert_rows.append(jax.lax.dynamic_slice_in_dim(
                    vert_conv_x, row, 1, axis=1)[:, 0])  # (N, W, 2*hid)
                v = out_vert
            img_row = jax.lax.dynamic_slice_in_dim(img, row, 1, axis=1)[:, 0]
            col_keys = jax.random.split(row_key, w_dim)

            def col_step(carry, xs):
                h_buf, img_row = carry
                w, key = xs
                taps0 = gather_taps(img_row, w, (-2, -1))
                h0 = self.conv_hstack.h_taps(taps0)
                h_buf = h_buf.at[0, :, w].set(h0)
                for i, layer in enumerate(self.conv_layers):
                    d = layer.dilation
                    taps = gather_taps(h_buf[i], w, (-d, 0))
                    h_next = layer.horiz_step(vert_rows[i][:, w], taps,
                                              h_buf[i][:, w], cond_px)
                    h_buf = h_buf.at[i + 1, :, w].set(h_next)
                logits = self.conv_out(jax.nn.elu(h_buf[n_layers][:, w]))
                logits = jnp.transpose(
                    logits.reshape(n, 256, self.channels), (0, 2, 1))
                draw = jax.random.categorical(key, logits, axis=-1)
                value = draw.astype(jnp.float32) / 255.0
                if normalize:
                    value = value * 2.0 - 1.0
                cur = img_row[:, w]
                new = jnp.where(cur != -1.0, cur, value)
                img_row = img_row.at[:, w].set(new)
                return (h_buf, img_row), None

            h_buf0 = jnp.zeros((n_layers + 1, n, w_dim, hid))
            (_, img_row), _ = jax.lax.scan(
                col_step, (h_buf0, img_row), (jnp.arange(w_dim), col_keys))
            img = jax.lax.dynamic_update_slice_in_dim(
                img, img_row[:, None], row, axis=1)
            return img, None

        img, _ = jax.lax.scan(row_step, img, (jnp.arange(h_dim), row_keys))
        return img

    def row_logits(self, img, y=None):
        """Debug/equivalence path: causal logits for a FIXED image via the
        incremental machinery (no sampling).  Returns (N, H, W, C, 256)."""
        n, h_dim, w_dim, _ = img.shape
        cond4 = self._cond4d(y)
        cond_px = (y if (self.class_condition and y is not None) else None)
        n_layers = len(self.conv_layers)
        hid = self.hidden_dim
        vert_all = self.vert_features(img, y)

        def gather_taps(buf_lw, w, offsets):
            cols = []
            for off in offsets:
                idx = w + off
                valid = idx >= 0
                col = jax.lax.dynamic_slice_in_dim(
                    buf_lw, jnp.maximum(idx, 0), 1, axis=1)[:, 0]
                cols.append(jnp.where(valid, col, 0.0))
            return jnp.stack(cols, axis=1)

        def row_step(_, row):
            img_row = jax.lax.dynamic_slice_in_dim(img, row, 1, axis=1)[:, 0]
            vert_rows = [jax.lax.dynamic_slice_in_dim(v, row, 1, axis=1)[:, 0]
                         for v in vert_all]

            def col_step(h_buf, w):
                taps0 = gather_taps(img_row, w, (-2, -1))
                h0 = self.conv_hstack.h_taps(taps0)
                h_buf = h_buf.at[0, :, w].set(h0)
                for i, layer in enumerate(self.conv_layers):
                    d = layer.dilation
                    taps = gather_taps(h_buf[i], w, (-d, 0))
                    h_next = layer.horiz_step(vert_rows[i][:, w], taps,
                                              h_buf[i][:, w], cond_px)
                    h_buf = h_buf.at[i + 1, :, w].set(h_next)
                logits = self.conv_out(jax.nn.elu(h_buf[n_layers][:, w]))
                logits = jnp.transpose(
                    logits.reshape(n, 256, self.channels), (0, 2, 1))
                return h_buf, logits

            h_buf0 = jnp.zeros((n_layers + 1, n, w_dim, hid))
            _, logits = jax.lax.scan(col_step, h_buf0, jnp.arange(w_dim))
            return None, jnp.transpose(logits, (1, 0, 2, 3))  # (N, W, C, 256)

        _, rows = jax.lax.scan(row_step, None, jnp.arange(h_dim))
        return jnp.transpose(rows, (1, 0, 2, 3, 4))  # (N, H, W, C, 256)


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
        # one-hot contraction, NOT take_along_axis: the gather's fwd+bwd pair
        # with the primal loss kept live (value_and_grad inside grad_step)
        # crashes the TPU compiler at this 5-D (B,H,W,C,256) shape; the
        # exact-equivalent one-hot sum fuses into the softmax reduction
        nll = -(logp * jax.nn.one_hot(targets, logp.shape[-1],
                                      dtype=logp.dtype)).sum(-1)
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
        """Row-causal fast sampler (see PixelCNNNet.sample_rows): ~H vertical
        passes + H*W cheap column steps instead of the reference's H*W full
        forwards (pixelcnn.py:167-195)."""
        h_dim, w_dim, c_dim = self.height, self.width, self.channels
        img = (jnp.full((n, h_dim, w_dim, c_dim), -1.0)
               if init_img is None else init_img)
        net = self.modules["net"]
        return net.apply({"params": state.params["net"]}, img, rng,
                         self.input_normalize, cond,
                         method=PixelCNNNet.sample_rows)

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
