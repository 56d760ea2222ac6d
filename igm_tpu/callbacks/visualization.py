"""Visualization callbacks (parity: src/callbacks/visualization.py).

All consume host-side numpy ValidationResults (NHWC); image grids match
torchvision.make_grid semantics (pad_value=1, value_range (-1,1) when the
model is trained on normalized inputs).
"""
from __future__ import annotations

import io
from pathlib import Path
from typing import Optional

import numpy as np


def make_grid(imgs: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 1.0, normalize: bool = False,
              value_range=None) -> np.ndarray:
    """NHWC float -> HWC float grid in [0,1] (torchvision.make_grid parity)."""
    imgs = np.asarray(imgs, dtype=np.float32)
    if imgs.ndim == 3:
        imgs = imgs[None]
    if normalize:
        lo, hi = value_range if value_range else (imgs.min(), imgs.max())
        imgs = np.clip((imgs - lo) / max(hi - lo, 1e-5), 0.0, 1.0)
    else:
        imgs = np.clip(imgs, 0.0, 1.0)
    n, h, w, c = imgs.shape
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    grid = np.full((padding + nrows * (h + padding),
                    padding + ncol * (w + padding), c), pad_value, np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y:y + h, x:x + w] = imgs[i]
    if c == 1:
        grid = np.repeat(grid, 3, axis=-1)
    return grid


def get_grid_images(imgs, model, nimgs: int = 64, nrow: int = 8) -> np.ndarray:
    """(visualization.py:141-148) value-range aware grid."""
    imgs = np.asarray(imgs)[:nimgs]
    if model.input_normalize:
        return make_grid(imgs, nrow=nrow, normalize=True, value_range=(-1, 1))
    return make_grid(imgs, nrow=nrow)


def save_image_grid(grid_hwc: np.ndarray, path: str) -> None:
    from PIL import Image
    arr = (np.clip(grid_hwc, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


class SampleImagesCallback:
    """(visualization.py:13-38) real/recon/fake/others grids + results/*.jpg."""

    def __init__(self, batch_size: int = 64, every_n_epochs: int = 1):
        self.batch_size = batch_size
        self.every_n_epochs = every_n_epochs

    def on_validation_batch_end(self, trainer, model, outputs, batch, batch_idx):
        if trainer.current_epoch % self.every_n_epochs != 0 or batch_idx != 0:
            return
        epoch = trainer.current_epoch
        logger = trainer.logger
        if outputs.real_image is not None:
            logger.log_image("images/real",
                             get_grid_images(outputs.real_image, model), epoch)
        if outputs.recon_image is not None:
            logger.log_image("images/recon",
                             get_grid_images(outputs.recon_image, model), epoch)
        if outputs.fake_image is not None:
            fake_grid = get_grid_images(outputs.fake_image, model)
            logger.log_image("images/sample", fake_grid, epoch)
            result_path = Path("results")
            result_path.mkdir(parents=True, exist_ok=True)
            save_image_grid(fake_grid, str(result_path / f"{epoch}.jpg"))
        for key, value in (outputs.others or {}).items():
            if value is not None:
                logger.log_image(f"images/{key}",
                                 get_grid_images(value, model), epoch)


class TraverseLatentCallback:
    """(visualization.py:41-73) per-latent-dim traversal grids."""

    def __init__(self, col: int = 10, row: int = 10):
        self.col = col
        self.row = row
        self.z: Optional[np.ndarray] = None

    def _traverse_grid(self, trainer, model, fixed_z: Optional[np.ndarray]):
        import jax.numpy as jnp
        latent_dim = int(model.hparams["latent_dim"])
        row, col = 11, min(10, latent_dim)
        if fixed_z is None:
            base = np.random.randn(1, 1, latent_dim).astype(np.float32)
        else:
            base = np.asarray(fixed_z, np.float32).reshape(1, 1, latent_dim)
        z = np.tile(base, (row, col, 1))
        variation = np.linspace(-3, 3, row, dtype=np.float32)
        for i in range(col):
            z[:, i, i] = variation
        imgs = model.forward(trainer.state, jnp.asarray(z.reshape(row * col, -1)))
        return get_grid_images(np.asarray(imgs), model, nimgs=row * col, nrow=col)

    def on_validation_batch_end(self, trainer, model, outputs, batch, batch_idx):
        if batch_idx == 0:
            self.z = outputs.encode_latent

    def on_validation_epoch_end(self, trainer, model):
        if "latent_dim" not in model.hparams:
            return
        epoch = trainer.current_epoch
        if self.z is not None and len(self.z) > 6:
            trainer.logger.log_image(
                "sample/fixed_traverse_latents_1",
                self._traverse_grid(trainer, model, self.z[3]), epoch)
            trainer.logger.log_image(
                "sample/fixed_traverse_latents_2",
                self._traverse_grid(trainer, model, self.z[6]), epoch)
        trainer.logger.log_image(
            "sample/random_traverse_latents",
            self._traverse_grid(trainer, model, None), epoch)


class Visual2DSpaecCallback:
    """(visualization.py:75-87) decode a 20x20 latent meshgrid (2-D latents)."""

    def on_validation_epoch_end(self, trainer, model):
        if int(model.hparams.get("latent_dim", 0)) != 2:
            return
        import jax.numpy as jnp
        x = np.linspace(-3, 3, 20, dtype=np.float32)
        y = np.linspace(3, -3, 20, dtype=np.float32)
        yy, xx = np.meshgrid(y, x, indexing="ij")
        latent = np.stack([yy.reshape(-1), xx.reshape(-1)], axis=1)
        imgs = model.forward(trainer.state, jnp.asarray(latent))
        trainer.logger.log_image(
            "sample/grid_imgs",
            get_grid_images(np.asarray(imgs), model, nimgs=400, nrow=20),
            trainer.current_epoch)


class LatentVisualizationCallback:
    """(visualization.py:89-139) scatter of 2-D latents colored by label."""

    def __init__(self):
        self.latents = []
        self.labels = []

    def on_validation_epoch_start(self, trainer, model):
        self.latents, self.labels = [], []

    def on_validation_batch_end(self, trainer, model, outputs, batch, batch_idx):
        if int(model.hparams.get("latent_dim", 0)) != 2:
            return
        if outputs.encode_latent is not None and outputs.label is not None:
            self.latents.append(np.asarray(outputs.encode_latent))
            self.labels.append(np.asarray(outputs.label))

    def on_validation_epoch_end(self, trainer, model):
        if int(model.hparams.get("latent_dim", 0)) != 2 or not self.latents:
            return
        latents = np.concatenate(self.latents)
        labels = np.concatenate(self.labels)
        order = np.argsort(labels, kind="stable")
        img = make_scatter(latents[order, 0], latents[order, 1],
                           c=labels[order], xlim=(-3, 3), ylim=(-3, 3))
        trainer.logger.log_image("val/latent distributions", img,
                                 trainer.current_epoch)
        self.latents, self.labels = [], []


def make_scatter(x, y, c=None, s=None, xlim=None, ylim=None) -> np.ndarray:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image
    fig = plt.figure()
    plt.scatter(x=x, y=y, s=s, c=c, cmap="tab10", alpha=1)
    if xlim:
        plt.xlim(xlim)
    if ylim:
        plt.ylim(ylim)
    plt.title("Latent distribution")
    buf = io.BytesIO()
    plt.savefig(buf, format="jpeg")
    plt.close(fig)
    buf.seek(0)
    return np.asarray(Image.open(buf), np.float32) / 255.0
