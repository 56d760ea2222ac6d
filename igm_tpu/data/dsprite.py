"""dSprites datamodule: npz parser + fixed-seed 80/20 split.

Parity: `/root/reference/src/datamodules/dsprite.py:10-42` — loads
``dsprites_64x64.npz`` (binary {0,1} ``imgs``), splits 80/20 with a FIXED
generator seed 666 so the split is identical across runs.  The reference's
``CustomTensorDataset`` returns a random second image in the label slot
(`datamodules/utils.py:24-33`) which every model treats as a throwaway
(SURVEY.md §8); here the label slot is a zero int32 array.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from .base import Arrays, BaseDatamodule

SPLIT_SEED = 666  # reference: dsprite.py:42


class DataModule(BaseDatamodule):
    native_shape = (64, 64, 1)
    synthetic_binary = True

    def _load(self) -> Tuple[Arrays, Arrays]:
        path = self.data_dir / "dsprite" / "dsprites_64x64.npz"
        if not path.exists():
            raise FileNotFoundError(path)
        with np.load(path, allow_pickle=False) as z:
            imgs = np.asarray(z["imgs"], np.uint8)
        imgs = imgs[..., None]
        n = len(imgs)
        order = np.random.default_rng(SPLIT_SEED).permutation(n)
        n_train = int(0.8 * n)
        tr, va = order[:n_train], order[n_train:]
        zeros = lambda idx: np.zeros((len(idx),), np.int32)  # noqa: E731
        return ((imgs[tr], zeros(tr)), (imgs[va], zeros(va)))
