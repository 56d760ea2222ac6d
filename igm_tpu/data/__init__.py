"""Data layer: datamodule zoo + host input pipeline.

Parity: `/root/reference/src/datamodules/` (SURVEY.md §2.3 Datamodules).
Datamodules parse each dataset's official on-disk container format into
contiguous uint8 NHWC numpy arrays once per run; batch assembly is a
multithreaded C++ gather (native.py) and device transfer is a
double-buffered prefetcher (loader.py).  uint8->float convert/normalize
happens ON DEVICE inside the jitted train step (models/base.py
``preprocess``), so host->device traffic stays uint8.
"""
from .base import BaseDatamodule  # noqa: F401
from .celeba import CelebADataModule  # noqa: F401
from .cifar10 import CIFAR10DataModule  # noqa: F401
from .dsprite import DataModule  # noqa: F401
from .mnist import MNISTDataModule  # noqa: F401
