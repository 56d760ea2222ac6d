"""FID evaluation callback (parity: src/callbacks/evaluation.py:8-30).

Streams real/fake ValidationResult images into gaussian feature stats and
logs ``metrics/fid`` at validation-epoch end.  RGB-only guard (channels==3)
like the reference.
"""
from __future__ import annotations

import numpy as np

from ..utils.utils import get_logger
from .fid import FeatureStats, frechet_distance, get_feature_backend

log = get_logger(__name__)


class FIDEvaluationCallback:
    def __init__(self, every_n_epochs: int = 1, backend: str | None = None):
        self.every_n_epochs = every_n_epochs
        self.backend = backend
        self._real = None
        self._fake = None
        self._warned = False

    def _active(self, trainer, model) -> bool:
        return (model.channels == 3
                and trainer.current_epoch % self.every_n_epochs == 0)

    def _to_uint8(self, imgs: np.ndarray, model) -> np.ndarray:
        imgs = np.asarray(imgs, np.float32)
        if model.input_normalize:
            imgs = (imgs + 1.0) / 2.0
        return (np.clip(imgs, 0, 1) * 255).astype(np.uint8)

    def on_validation_epoch_start(self, trainer, model):
        if not self._active(trainer, model):
            self._real = self._fake = None
            return
        fe, dim, name = get_feature_backend(self.backend)
        if name != "inception" and not self._warned:
            log.warning("FID running with %r feature backend (no Inception "
                        "weights found; set IGM_INCEPTION_WEIGHTS) — logging "
                        "tag metrics/fid_%s, NOT metrics/fid", name, name)
            self._warned = True
        self._fe = fe
        self._backend_name = name
        self._real = FeatureStats(dim)
        self._fake = FeatureStats(dim)

    def on_validation_batch_end(self, trainer, model, outputs, batch, batch_idx):
        if self._real is None:
            return
        if outputs.real_image is not None:
            self._real.update(self._fe(self._to_uint8(outputs.real_image, model)))
        if outputs.fake_image is not None:
            self._fake.update(self._fe(self._to_uint8(outputs.fake_image, model)))

    def on_validation_epoch_end(self, trainer, model):
        if self._real is None or self._real.n == 0 or self._fake.n == 0:
            return
        mu_r, cov_r = self._real.finalize()
        mu_f, cov_f = self._fake.finalize()
        fid = frechet_distance(mu_r, cov_r, mu_f, cov_f)
        # The reference tag ``metrics/fid`` means Inception-pool3 FID
        # (src/callbacks/evaluation.py:28-30).  A degraded backend logs a
        # backend-suffixed tag so its values can never be mistaken for
        # published-comparable FIDs.
        if self._backend_name == "inception":
            trainer.log("metrics/fid", fid)
        else:
            trainer.log(f"metrics/fid_{self._backend_name}", fid)
        self._real = self._fake = None
