"""TensorBoard logging + metric accumulation.

Tag names match the reference (``train_loss/*``, ``train_log/*``,
``val_log/*``, ``metrics/fid``, ``images/*``) for curve parity
(SURVEY.md §5 metrics row).
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np


class TensorBoardLogger:
    """tensorboardX-backed logger (TensorBoardLogger target parity)."""

    def __init__(self, save_dir: str = "tensorboard/", name: str = "",
                 version: str = "", **_: object):
        self.save_dir = os.path.join(save_dir, name, version)
        self._writer = None

    @property
    def experiment(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter
            os.makedirs(self.save_dir, exist_ok=True)
            self._writer = SummaryWriter(self.save_dir)
        return self._writer

    def log_scalar(self, tag: str, value: float, step: int) -> None:
        self.experiment.add_scalar(tag, float(value), step)

    def log_scalars(self, metrics: Dict[str, float], step: int) -> None:
        for tag, value in metrics.items():
            if value is None or (isinstance(value, float) and np.isnan(value)):
                continue
            self.log_scalar(tag, value, step)

    def log_image(self, tag: str, img_hwc: np.ndarray, step: int) -> None:
        """img_hwc: float array (H, W, C) in [0, 1]."""
        self.experiment.add_image(tag, img_hwc, step, dataformats="HWC")

    def log_hyperparams(self, params: Dict[str, object]) -> None:
        try:
            flat = {k: (v if isinstance(v, (int, float, bool, str)) else str(v))
                    for k, v in params.items()}
            self.experiment.add_hparams(flat, {})
        except Exception:
            pass

    def finalize(self) -> None:
        if self._writer is not None:
            self._writer.flush()
            self._writer.close()


class WandbLogger:
    """Optional Weights & Biases logger (parity: the reference's wandb
    support — requirements.txt:20 + the ``finish`` teardown in
    src/utils/utils.py:169-184).

    wandb is not a baked-in dependency; when it is absent this logger
    degrades to a loud no-op so ``logger=wandb`` configs still run.
    ``finalize`` mirrors the reference's explicit ``wandb.finish()`` (it
    closes the run so multirun sweeps don't bleed into one another).
    """

    def __init__(self, project: str = "image-generation-models",
                 name: str = "", save_dir: str = "wandb/", **kwargs):
        self._run = None
        try:
            import wandb
        except ImportError:
            import logging
            logging.getLogger(__name__).warning(
                "logger=wandb configured but wandb is not installed — "
                "logging disabled (pip install wandb to enable)")
            self._wandb = None
            return
        self._wandb = wandb
        os.makedirs(save_dir, exist_ok=True)
        self._run = wandb.init(project=project, name=name or None,
                               dir=save_dir, **kwargs)

    @property
    def experiment(self):
        return self._run

    def log_scalar(self, tag: str, value: float, step: int) -> None:
        if self._run is not None:
            self._run.log({tag: float(value)}, step=step)

    def log_scalars(self, metrics: Dict[str, float], step: int) -> None:
        if self._run is not None:
            clean = {t: float(v) for t, v in metrics.items()
                     if v is not None and not (isinstance(v, float) and np.isnan(v))}
            self._run.log(clean, step=step)

    def log_image(self, tag: str, img_hwc: np.ndarray, step: int) -> None:
        if self._run is not None:
            self._run.log({tag: self._wandb.Image(np.asarray(img_hwc))},
                          step=step)

    def log_hyperparams(self, params: Dict[str, object]) -> None:
        if self._run is not None:
            self._run.config.update(params, allow_val_change=True)

    def finalize(self) -> None:
        # reference parity: always finish() so sweep children close cleanly
        if self._wandb is not None and self._wandb.run is not None:
            self._wandb.finish()


class NoOpLogger(TensorBoardLogger):
    def __init__(self):
        super().__init__()

    @property
    def experiment(self):  # pragma: no cover
        class _Sink:
            def __getattr__(self, _):
                return lambda *a, **k: None
        return _Sink()

    def log_scalar(self, *a, **k):
        pass

    def log_image(self, *a, **k):
        pass

    def finalize(self):
        pass


class MetricAccumulator:
    """Running means of per-step metrics; NaN entries mean 'inactive this
    step' (the lax.cond branch not taken) and are skipped."""

    def __init__(self):
        self._sums: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}

    def update(self, metrics: Dict[str, float]) -> None:
        for k, v in metrics.items():
            v = float(v)
            if np.isnan(v):
                continue
            self._sums[k] = self._sums.get(k, 0.0) + v
            self._counts[k] = self._counts.get(k, 0) + 1

    def compute(self) -> Dict[str, float]:
        return {k: self._sums[k] / self._counts[k] for k in self._sums}

    def reset(self) -> None:
        self._sums.clear()
        self._counts.clear()
