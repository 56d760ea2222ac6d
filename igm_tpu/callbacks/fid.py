"""Fréchet distance machinery for the FID callback.

torchmetrics' FrechetInceptionDistance (used by the reference,
`src/callbacks/evaluation.py:8-30`) = InceptionV3 pool3 features (2048-d) +
Fréchet distance between gaussian fits of the real/fake feature streams.

Feature extractors are pluggable:
- ``inception``: a Flax InceptionV3; weights loaded from the npz pointed to
  by ``IGM_INCEPTION_WEIGHTS`` (no public authless download exists in this
  offline environment).  When absent we fall back to:
- ``random``: a fixed-seed random conv net (LeCun-normal, frozen).  Distances
  from random-feature FID correlate well with Inception FID for
  ranking/trending (the number itself is not comparable to published FIDs);
  clearly labelled in logs as ``metrics/fid`` computed with backend=<name>.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class FeatureStats:
    """Streaming mean/second-moment accumulator in float64 (host)."""

    def __init__(self, dim: int):
        self.dim = dim
        self.n = 0
        self.sum = np.zeros((dim,), np.float64)
        self.outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray) -> None:
        feats = np.asarray(feats, np.float64)
        self.n += feats.shape[0]
        self.sum += feats.sum(axis=0)
        self.outer += feats.T @ feats

    def finalize(self):
        mu = self.sum / max(self.n, 1)
        cov = (self.outer - self.n * np.outer(mu, mu)) / max(self.n - 1, 1)
        return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(c1 + c2 - 2 sqrt(c1 c2)) (torchmetrics math)."""
    import scipy.linalg
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(cov1 @ cov2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * np.trace(covmean))


class RandomConvFeatures:
    """Frozen random conv net: 4x (conv s2 + relu) + global mean pool."""

    DIM = 512

    def __init__(self, seed: int = 0):
        from flax import linen as nn

        class _Net(nn.Module):
            @nn.compact
            def __call__(self, x):
                for feats in (64, 128, 256, 512):
                    x = nn.Conv(feats, (3, 3), strides=(2, 2), padding="SAME")(x)
                    x = nn.relu(x)
                return x.mean(axis=(1, 2))

        self.net = _Net()
        self.params = self.net.init(jax.random.PRNGKey(seed),
                                    jnp.zeros((1, 32, 32, 3)))
        self._apply = jax.jit(self.net.apply)

    def __call__(self, imgs_uint8: np.ndarray) -> np.ndarray:
        """imgs: uint8 NHWC; grayscale is tiled to RGB (torchmetrics
        convention — its FID expects 3-channel input)."""
        x = jnp.asarray(imgs_uint8).astype(jnp.float32) / 127.5 - 1.0
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        return np.asarray(self._apply(self.params, x))


class InceptionFeatures:
    """Flax InceptionV3 pool3 features; requires a local weights npz."""

    DIM = 2048

    def __init__(self, weights_path: str):
        from ..networks.inception import InceptionV3, load_weights_npz
        self.net = InceptionV3()
        self.params = load_weights_npz(weights_path)
        self._apply = jax.jit(self.net.apply)

    def __call__(self, imgs_uint8: np.ndarray) -> np.ndarray:
        x = jnp.asarray(imgs_uint8).astype(jnp.float32) / 255.0
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        # pytorch-fid / torchmetrics preprocessing: bilinear resize to
        # 299 (align_corners=False semantics — matches jax.image.resize
        # "bilinear"), then scale [0,1] -> [-1,1].  NOT imagenet stats:
        # the FID network's TF-ported weights expect 2x-1 input
        # (pytorch-fid InceptionV3.normalize_input).
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
        x = 2.0 * x - 1.0
        return np.asarray(self._apply(self.params, x))


_BACKEND_CACHE: dict = {}


def get_feature_backend(name: Optional[str] = None):
    """Returns (callable, dim, backend_name)."""
    if name is None:
        name = "inception" if os.environ.get("IGM_INCEPTION_WEIGHTS") else "random"
    if name in _BACKEND_CACHE:
        return _BACKEND_CACHE[name]
    if name == "inception":
        weights = os.environ.get("IGM_INCEPTION_WEIGHTS", "")
        if weights and os.path.exists(weights):
            fe = InceptionFeatures(weights)  # raise loudly on a bad file
            _BACKEND_CACHE[name] = (fe, fe.DIM, "inception")
            return _BACKEND_CACHE[name]
        import logging
        logging.getLogger(__name__).warning(
            "inception backend requested but IGM_INCEPTION_WEIGHTS=%r does "
            "not exist — falling back to the random backend (FID values NOT "
            "comparable to published Inception FIDs)", weights)
        name = "random"
    fe = RandomConvFeatures()
    _BACKEND_CACHE["random"] = (fe, fe.DIM, "random")
    return _BACKEND_CACHE["random"]
