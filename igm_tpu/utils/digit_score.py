"""Offline sample-quality score for adversarial families (digit IS).

The reference scores RGB samples with a pretrained-Inception FID
(`/root/reference/src/callbacks/evaluation.py:8-30`); this image has no
network egress, so no Inception weights can exist (docs/FID.md).  This
module is the honest offline analog: a small CNN digit classifier trained
deterministically on the PACKAGED REAL digit scans (igm_tpu/data/packaged.py
— 1,437 genuine NIST 8x8 scans upscaled), used to score generated samples
with

- ``mean_confidence``: E[max_y p(y|x)] — blobs/noise score ~0.1-0.4, clean
  digits ~0.9+
- ``coverage``: #distinct classes among confident (>0.5) predictions —
  mode collapse scores low
- ``inception_score``: exp(E[KL(p(y|x) || p(y))]) with the digit classifier
  in Inception's place — the classic IS formula

Weights are trained once per geometry and cached on disk
(``<data_dir>/digit_classifier_<h>x<w>.npz``), so tests and the gallery
scorer share one deterministic classifier.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class DigitCNN(nn.Module):
    """Small digit classifier: 2 strided convs + dense head."""

    @nn.compact
    def __call__(self, x):  # x: (N, H, W, 1) in [-1, 1]
        x = nn.relu(nn.Conv(16, (3, 3), strides=2)(x))
        x = nn.relu(nn.Conv(32, (3, 3), strides=2)(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(64)(x))
        return nn.Dense(10)(x)


def _digits_at(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real digit scans upscaled to (h, w), normalized to [-1, 1]."""
    from ..data.packaged import load_real_digits, upscale

    imgs, labels = load_real_digits()                  # (1797, 8, 8) uint8
    f = max(min(h, w) // 8, 1)
    imgs = upscale(imgs, f)
    hh, ww = imgs.shape[1:3]
    canvas = np.zeros((len(imgs), h, w), np.uint8)
    y0, x0 = max((h - hh) // 2, 0), max((w - ww) // 2, 0)
    canvas[:, y0:y0 + min(hh, h), x0:x0 + min(ww, w)] = \
        imgs[:, :min(hh, h), :min(ww, w)]
    x = canvas.astype(np.float32)[..., None] / 127.5 - 1.0
    return x, labels


def train_classifier(h: int = 28, w: int = 28, epochs: int = 30,
                     seed: int = 0) -> Tuple[Dict, float]:
    """Train on the first 1437 scans, validate on the rest; deterministic.

    Returns (params, val_accuracy)."""
    import optax

    x, y = _digits_at(h, w)
    xtr, ytr, xva, yva = x[:1437], y[:1437], x[1437:], y[1437:]
    net = DigitCNN()
    params = net.init(jax.random.PRNGKey(seed), xtr[:1])
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, xb, yb):
        def loss_fn(p):
            logits = net.apply(p, xb)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    rng = np.random.default_rng(seed)
    bs = 128
    for _ in range(epochs):
        order = rng.permutation(len(xtr))
        for i in range(0, len(xtr) - bs + 1, bs):
            idx = order[i:i + bs]
            params, opt, _ = step(params, opt, xtr[idx], ytr[idx])
    pred = np.asarray(jax.jit(net.apply)(params, xva).argmax(-1))
    acc = float((pred == yva).mean())
    return params, acc


def load_or_train(cache_dir: str, h: int = 28, w: int = 28) -> Dict:
    """Disk-cached classifier params for geometry (h, w)."""
    path = Path(cache_dir) / f"digit_classifier_{h}x{w}.npz"
    if path.exists():
        flat = dict(np.load(path))
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(
                DigitCNN().init(jax.random.PRNGKey(0),
                                jnp.zeros((1, h, w, 1)))),
            [flat[f"p{i}"] for i in range(len(flat))])
    params, acc = train_classifier(h, w)
    assert acc > 0.90, f"digit classifier underfit: val acc {acc}"
    leaves = jax.tree_util.tree_leaves(jax.device_get(params))
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **{f"p{i}": leaf for i, leaf in enumerate(leaves)})
    return params


def score_samples(params, imgs: np.ndarray) -> Dict[str, float]:
    """Score generated samples.

    ``imgs``: (N, H, W, C) float in [-1, 1] (C>1 is averaged to gray).
    """
    x = np.asarray(imgs, np.float32)
    if x.ndim == 3:
        x = x[..., None]
    if x.shape[-1] > 1:
        x = x.mean(axis=-1, keepdims=True)
    probs = np.asarray(jax.nn.softmax(
        jax.jit(DigitCNN().apply)(params, jnp.asarray(x)), axis=-1))
    conf = probs.max(axis=-1)
    pred = probs.argmax(axis=-1)
    covered = np.unique(pred[conf > 0.5])
    marginal = probs.mean(axis=0)
    kl = (probs * (np.log(probs + 1e-12)
                   - np.log(marginal + 1e-12)[None])).sum(-1)
    return {
        "mean_confidence": float(conf.mean()),
        "coverage": int(len(covered)),
        "inception_score": float(np.exp(kl.mean())),
        "n": int(len(x)),
    }
