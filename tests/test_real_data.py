"""Every dataset parser against REAL container bytes (VERDICT item 3).

data/ is populated by tools/make_real_datasets.py: real handwritten-digit
scans (sklearn load_digits, NIST provenance) packaged byte-exactly in each
dataset's official on-disk format.  IGM_SYNTHETIC_DATA is forced OFF here,
so any parser miss raises instead of silently falling back — these tests
prove the IDX/pickle/npz/jpeg+partition paths on real headers and real
payload bytes.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
DATA = REPO / "data"


@pytest.fixture(autouse=True)
def _no_synthetic(monkeypatch):
    monkeypatch.setenv("IGM_SYNTHETIC_DATA", "0")


def _check(imgs, labels, shape, n_classes=10, binary=False):
    assert imgs.shape[1:] == shape
    assert imgs.dtype == np.uint8
    assert labels.dtype == np.int32 and len(labels) == len(imgs)
    assert labels.min() >= 0 and labels.max() < n_classes
    if binary:
        assert set(np.unique(imgs)) <= {0, 1}
    else:
        assert imgs.max() > 200 and imgs.min() == 0  # real dynamic range
    # real images are not constant or noise: neighbouring-pixel correlation
    flat = imgs[:64].astype(np.float32)
    a, b = flat[..., :-1, :], flat[..., 1:, :]
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.5, f"spatial correlation {corr} too low for real images"


def test_mnist_idx_parser_real_bytes():
    from igm_tpu.data.mnist import MNISTDataModule
    dm = MNISTDataModule(data_dir=str(DATA), batch_size=8)
    dm.setup()
    tr_x, tr_y = dm.train_arrays()
    va_x, va_y = dm.val_arrays()
    _check(tr_x, tr_y, (28, 28, 1))
    _check(va_x, va_y, (28, 28, 1))
    assert len(tr_x) == 1437 and len(va_x) == 360


def test_mnist_idx_magic_and_bigendian():
    """The parser must honour the IDX header, not assume offsets."""
    import gzip
    import struct
    raw = DATA / "MNIST" / "raw" / "train-images-idx3-ubyte.gz"
    with gzip.open(raw, "rb") as fh:
        magic, n, h, w = struct.unpack(">IIII", fh.read(16))
    assert magic == 0x00000803  # ubyte, 3 dims — official constant
    assert (n, h, w) == (1437, 28, 28)


def test_cifar10_pickle_parser_real_bytes():
    from igm_tpu.data.cifar10 import CIFAR10DataModule
    dm = CIFAR10DataModule(data_dir=str(DATA), batch_size=8)
    dm.setup()
    tr_x, tr_y = dm.train_arrays()
    va_x, va_y = dm.val_arrays()
    _check(tr_x, tr_y, (32, 32, 3))
    _check(va_x, va_y, (32, 32, 3))
    assert len(tr_x) == 1437
    # plane deinterleave check: our packer wrote R==G==B
    assert (tr_x[..., 0] == tr_x[..., 1]).all()


def test_dsprites_npz_parser_real_bytes():
    from igm_tpu.data.dsprite import DataModule
    dm = DataModule(data_dir=str(DATA), batch_size=8)
    dm.setup()
    tr_x, tr_y = dm.train_arrays()
    _check(tr_x, tr_y, (64, 64, 1), binary=True)
    # fixed-seed 80/20 split determinism
    dm2 = DataModule(data_dir=str(DATA), batch_size=8)
    dm2.setup()
    assert (dm2.train_arrays()[0][:16] == tr_x[:16]).all()


def test_celeba_jpeg_partition_parser_real_bytes(tmp_path):
    import shutil
    # copy so the npz cache never dirties the repo data dir
    shutil.copytree(DATA / "celeba", tmp_path / "celeba")
    from igm_tpu.data.celeba import CelebADataModule
    dm = CelebADataModule(data_dir=str(tmp_path), batch_size=8)
    dm.setup()
    tr_x, tr_y = dm.train_arrays()
    va_x, va_y = dm.val_arrays()
    _check(tr_x, tr_y, (64, 64, 3), n_classes=1)
    assert len(tr_x) == 204 and len(va_x) == 52  # 80/20 of 256
    # second setup must hit the npz cache and agree exactly
    dm2 = CelebADataModule(data_dir=str(tmp_path), batch_size=8)
    dm2.setup()
    assert (dm2.train_arrays()[0] == tr_x).all()
    assert dm._cache_path("train").exists()


def test_transform_grayscale_and_resize_applied():
    """Reference get_transform parity (src/datamodules/base.py:37-71):
    grayscale converts RGB->L (ITU-R 601) and resize honours the configured
    geometry — e.g. running the CIFAR parser under an MNIST-shaped config."""
    from igm_tpu.data.cifar10 import CIFAR10DataModule
    dm = CIFAR10DataModule(data_dir=str(DATA), width=28, height=28,
                           channels=1, batch_size=8,
                           transforms={"grayscale": True, "convert": True})
    dm.setup()
    imgs, labels = dm.train_arrays()
    assert imgs.shape[1:] == (28, 28, 1)
    assert imgs.dtype == np.uint8
    # luminance of an (r==g==b) gray image equals the channel value
    from igm_tpu.data.cifar10 import _load_batch
    raw, _ = _load_batch(DATA / "cifar-10-batches-py" / "data_batch_1")
    assert abs(int(imgs[0].mean()) - int(raw[0, ..., 0].mean())) <= 2
