"""Misc callbacks (parity: src/callbacks/util.py + tqdm progress)."""
from __future__ import annotations

from pathlib import Path

from ..utils.utils import get_logger

log = get_logger(__name__)


class ProgressBar:
    """Stand-in for Lightning's TQDMProgressBar: per-epoch summary line.

    (The Trainer already logs epoch time + imgs/sec; per-batch tqdm bars
    would force a device sync every refresh, which is exactly the host
    round-trip the TPU hot loop must avoid.)
    """

    def __init__(self, refresh_rate: int = 5, **_: object):
        self.refresh_rate = refresh_rate

    def on_train_epoch_end(self, trainer, model):
        metrics = {k: round(v, 4) for k, v in
                   list(trainer.callback_metrics.items())[:4]}
        log.info("[epoch %d/%d] step=%d %s", trainer.current_epoch + 1,
                 trainer.max_epochs, trainer.global_step, metrics)


class GifCallback:
    """(util.py:5-21) stitch results/{epoch}.jpg into video.gif at train end.

    Uses PIL instead of shelling out to ffmpeg.
    """

    def __init__(self, fps: int = 4):
        self.fps = fps

    def on_train_end(self, trainer, model):
        from PIL import Image
        frames_dir = Path("results")
        if not frames_dir.exists():
            return
        frames = sorted(frames_dir.glob("*.jpg"),
                        key=lambda p: int(p.stem) if p.stem.isdigit() else 0)
        if not frames:
            return
        imgs = [Image.open(f) for f in frames]
        imgs[0].save("video.gif", save_all=True, append_images=imgs[1:],
                     duration=int(1000 / self.fps), loop=0)
        log.info("wrote video.gif (%d frames)", len(imgs))
