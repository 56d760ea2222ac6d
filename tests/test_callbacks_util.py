"""GifCallback + WandbLogger shim + pallas_gn config knob (VERDICT item 9)."""
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_gif_callback_writes_gif(tmp_path, monkeypatch):
    """(reference util.py:5-21: ffmpeg results/%d.jpg -> video.gif)"""
    from PIL import Image
    from igm_tpu.callbacks.util import GifCallback

    monkeypatch.chdir(tmp_path)
    (tmp_path / "results").mkdir()
    rng = np.random.default_rng(0)
    for epoch in range(3):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(tmp_path / "results" / f"{epoch}.jpg")
    GifCallback(fps=2).on_train_end(trainer=None, model=None)
    out = tmp_path / "video.gif"
    assert out.exists()
    gif = Image.open(out)
    assert gif.format == "GIF"
    gif.seek(2)  # three frames exist
    with pytest.raises(EOFError):
        gif.seek(3)


def test_gif_callback_no_results_dir_is_noop(tmp_path, monkeypatch):
    from igm_tpu.callbacks.util import GifCallback
    monkeypatch.chdir(tmp_path)
    GifCallback().on_train_end(trainer=None, model=None)  # must not raise
    assert not (tmp_path / "video.gif").exists()


def test_wandb_logger_degrades_without_wandb(tmp_path):
    """wandb isn't installed in this image: the shim must no-op cleanly
    through the full logger interface (reference parity:
    src/utils/utils.py:169-184 optional-wandb handling)."""
    from igm_tpu.core.logging import WandbLogger

    lg = WandbLogger(project="t", name="x", save_dir=str(tmp_path / "wb"))
    assert lg.experiment is None
    lg.log_scalar("a", 1.0, 0)
    lg.log_scalars({"a": 1.0, "b": float("nan")}, 1)
    lg.log_image("img", np.zeros((4, 4, 3), np.float32), 0)
    lg.log_hyperparams({"lr": 1e-3})
    lg.finalize()


def test_wandb_logger_config_composes(config_dir):
    from igm_tpu.config import compose, instantiate
    cfg = compose(config_dir, ["experiment=vae/mnist_mlp", "logger=wandb",
                               "print_config=False"])
    assert cfg.logger._target_.endswith("WandbLogger")
    lg = instantiate(cfg.logger)
    lg.finalize()


def test_pallas_gn_is_config_knob_not_trace_env(monkeypatch):
    """IGM_PALLAS_GN must be captured at model construction, not at trace
    time (VERDICT weak item 8)."""
    from igm_tpu.config import to_node
    from igm_tpu.models.ddpm import DDPM

    dm = to_node({"width": 16, "height": 16, "channels": 1,
                  "transforms": {"convert": True, "normalize": True}})
    m_default = DDPM(datamodule=dm, hidden_dim=8, timesteps=4,
                     dim_mults=[1, 2])
    assert m_default.modules["denoise"].pallas_gn is False

    m_cfg = DDPM(datamodule=dm, hidden_dim=8, timesteps=4, dim_mults=[1, 2],
                 pallas_gn=True)
    assert m_cfg.modules["denoise"].pallas_gn is True

    monkeypatch.setenv("IGM_PALLAS_GN", "1")
    m_env = DDPM(datamodule=dm, hidden_dim=8, timesteps=4, dim_mults=[1, 2])
    assert m_env.modules["denoise"].pallas_gn is True
    # flipping the env AFTER construction must not affect the built model
    monkeypatch.setenv("IGM_PALLAS_GN", "0")
    assert m_env.modules["denoise"].pallas_gn is True
