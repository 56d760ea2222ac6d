"""Zero-egress dataset materialisation: real digit scans in official formats.

This image has no network egress, so ``prepare_data()`` can't download
MNIST/CIFAR/CelebA/dSprites.  The only real image data available is
scikit-learn's bundled ``load_digits`` — 1 797 genuine 8x8 handwritten-digit
scans (NIST provenance, the same family as MNIST).  ``ensure(data_dir)``
packages those real scans BYTE-EXACTLY into each dataset's official on-disk
container (IDX.gz / pickle batches / npz / JPEG+partition), so every parser
in this package runs against real container bytes, and real-data
convergence tests have genuine images to train on.

If a full dataset drop ever lands it uses the same layouts and simply
replaces these files.  Deterministic: seed-0 shuffle, fixed split sizes
(1437/360) — matches the archived runs in benchmarks/real_runs/.
"""
from __future__ import annotations

import gzip
import pickle
import struct
from pathlib import Path

import numpy as np

N_TRAIN = 1437  # ~80/20 of 1797
CELEBA_N = 256


def load_real_digits():
    from sklearn.datasets import load_digits
    d = load_digits()
    imgs = (d.images / 16.0 * 255.0).round().astype(np.uint8)  # (1797, 8, 8)
    labels = d.target.astype(np.int32)
    order = np.random.default_rng(0).permutation(len(imgs))
    return imgs[order], labels[order]


def upscale(imgs: np.ndarray, factor: int) -> np.ndarray:
    return np.kron(imgs, np.ones((1, factor, factor), np.uint8))


def write_idx(path: Path, arr: np.ndarray) -> None:
    """IDX: magic byte3=0x08 (ubyte), byte4=ndim; big-endian dims."""
    path.parent.mkdir(parents=True, exist_ok=True)
    magic = 0x0800 | arr.ndim
    header = struct.pack(">I", magic) + b"".join(
        struct.pack(">I", d) for d in arr.shape)
    with gzip.open(path, "wb") as fh:
        fh.write(header + arr.tobytes())


def make_mnist(out: Path, imgs, labels) -> None:
    x28 = np.pad(upscale(imgs, 3), ((0, 0), (2, 2), (2, 2)))  # 8->24->28
    raw = out / "MNIST" / "raw"
    write_idx(raw / "train-images-idx3-ubyte.gz", x28[:N_TRAIN])
    write_idx(raw / "train-labels-idx1-ubyte.gz",
              labels[:N_TRAIN].astype(np.uint8))
    write_idx(raw / "t10k-images-idx3-ubyte.gz", x28[N_TRAIN:])
    write_idx(raw / "t10k-labels-idx1-ubyte.gz",
              labels[N_TRAIN:].astype(np.uint8))


def make_cifar10(out: Path, imgs, labels) -> None:
    x32 = upscale(imgs, 4)  # (N, 32, 32)
    rgb = np.repeat(x32[:, None], 3, axis=1)  # (N, 3, 32, 32) planes
    flat = rgb.reshape(len(rgb), -1)  # R|G|B planes, official layout
    bdir = out / "cifar-10-batches-py"
    bdir.mkdir(parents=True, exist_ok=True)
    chunks = np.array_split(np.arange(N_TRAIN), 5)
    for i, idx in enumerate(chunks, 1):
        with open(bdir / f"data_batch_{i}", "wb") as fh:
            pickle.dump({b"data": flat[idx], b"labels": labels[idx].tolist()},
                        fh)
    with open(bdir / "test_batch", "wb") as fh:
        pickle.dump({b"data": flat[N_TRAIN:],
                     b"labels": labels[N_TRAIN:].tolist()}, fh)


def make_dsprites(out: Path, imgs) -> None:
    x64 = upscale(imgs, 8)  # (N, 64, 64)
    binary = (x64 > 127).astype(np.uint8)
    path = out / "dsprite" / "dsprites_64x64.npz"
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, imgs=binary)


def make_celeba(out: Path, imgs, n: int = CELEBA_N) -> None:
    from PIL import Image
    img_dir = out / "celeba" / "img_align_celeba"
    img_dir.mkdir(parents=True, exist_ok=True)
    names = []
    for i in range(min(n, len(imgs))):
        im = Image.fromarray(upscale(imgs[i:i + 1], 8)[0]).convert("RGB")
        im = im.resize((178, 218), Image.BICUBIC)  # aligned-CelebA geometry
        name = f"{i + 1:06d}.jpg"
        im.save(img_dir / name, quality=92)
        names.append(name)
    n_tr = int(0.8 * len(names))
    lines = [f"{nm} {0 if i < n_tr else 2}" for i, nm in enumerate(names)]
    (out / "celeba" / "list_eval_partition.txt").write_text("\n".join(lines))


_SENTINELS = (
    Path("MNIST/raw/train-images-idx3-ubyte.gz"),
    Path("cifar-10-batches-py/data_batch_1"),
    Path("dsprite/dsprites_64x64.npz"),
    Path("celeba/list_eval_partition.txt"),
)


def ensure(data_dir: Path, celeba_n: int = CELEBA_N) -> None:
    """Materialise any missing dataset under ``data_dir`` (idempotent)."""
    out = Path(data_dir)
    missing = [s for s in _SENTINELS if not (out / s).exists()]
    if not missing:
        return
    imgs, labels = load_real_digits()
    if not (out / _SENTINELS[0]).exists():
        make_mnist(out, imgs, labels)
    if not (out / _SENTINELS[1]).exists():
        make_cifar10(out, imgs, labels)
    if not (out / _SENTINELS[2]).exists():
        make_dsprites(out, imgs)
    if not (out / _SENTINELS[3]).exists():
        make_celeba(out, imgs, celeba_n)
