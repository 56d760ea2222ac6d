#!/usr/bin/env python
"""Package REAL image data into the real datasets' container formats.

This image has zero network egress and no dataset drop, so the only real
image data available is scikit-learn's bundled ``load_digits`` — 1 797
genuine 8x8 handwritten-digit scans (a NIST-derived test set; the same
provenance family as MNIST).  This tool packages those real images, byte-
exactly, into each dataset's official on-disk format so that every parser
in igm_tpu/data/ runs against real container bytes end-to-end:

- MNIST:    IDX (magic 0x803/0x801, big-endian dims), gzipped, torchvision
            layout ``MNIST/raw/``; digits upscaled 8->24 (x3) + 2px pad.
- CIFAR-10: python-pickle batches ``cifar-10-batches-py/data_batch_{1..5}``
            + ``test_batch`` with b"data" (N,3072 R|G|B planes) and
            b"labels"; digits upscaled x4 to 32x32, tiled to RGB.
- dSprites: ``dsprite/dsprites_64x64.npz`` with binary {0,1} "imgs";
            digits upscaled x8 and thresholded.
- CelebA:   ``celeba/img_align_celeba/*.jpg`` real JPEG encodings +
            ``list_eval_partition.txt`` (0=train/2=test).

Usage: python tools/make_real_datasets.py [--out ./data] [--celeba-n 256]

The packaged sets are small (1.8k images) — they exist to prove the
parsers and to give convergence tests real data, not to reproduce paper
numbers.  If a full MNIST/CIFAR drop ever lands, it uses the same layouts
and simply replaces these files.
"""
from __future__ import annotations

import argparse
import gzip
import pickle
import struct
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def load_real_digits():
    from sklearn.datasets import load_digits
    d = load_digits()
    imgs = (d.images / 16.0 * 255.0).round().astype(np.uint8)  # (1797, 8, 8)
    return imgs, d.target.astype(np.int32)


def upscale(imgs: np.ndarray, factor: int) -> np.ndarray:
    return np.kron(imgs, np.ones((1, factor, factor), np.uint8))


def write_idx(path: Path, arr: np.ndarray) -> None:
    """IDX format: magic byte3=0x08 (ubyte), byte4=ndim; big-endian dims."""
    path.parent.mkdir(parents=True, exist_ok=True)
    magic = 0x0800 | arr.ndim
    header = struct.pack(">I", magic) + b"".join(
        struct.pack(">I", d) for d in arr.shape)
    with gzip.open(path, "wb") as fh:
        fh.write(header + arr.tobytes())


def make_mnist(out: Path, imgs, labels) -> None:
    x28 = np.pad(upscale(imgs, 3), ((0, 0), (2, 2), (2, 2)))  # 8->24->28
    n_tr = 1437  # ~80/20
    raw = out / "MNIST" / "raw"
    write_idx(raw / "train-images-idx3-ubyte.gz", x28[:n_tr])
    write_idx(raw / "train-labels-idx1-ubyte.gz", labels[:n_tr].astype(np.uint8))
    write_idx(raw / "t10k-images-idx3-ubyte.gz", x28[n_tr:])
    write_idx(raw / "t10k-labels-idx1-ubyte.gz", labels[n_tr:].astype(np.uint8))


def make_cifar10(out: Path, imgs, labels) -> None:
    x32 = upscale(imgs, 4)  # (N, 32, 32)
    rgb = np.repeat(x32[:, None], 3, axis=1)  # (N, 3, 32, 32) planes
    flat = rgb.reshape(len(rgb), -1)  # R|G|B planes, official layout
    bdir = out / "cifar-10-batches-py"
    bdir.mkdir(parents=True, exist_ok=True)
    n_tr = 1437
    chunks = np.array_split(np.arange(n_tr), 5)
    for i, idx in enumerate(chunks, 1):
        with open(bdir / f"data_batch_{i}", "wb") as fh:
            pickle.dump({b"data": flat[idx], b"labels": labels[idx].tolist()},
                        fh)
    with open(bdir / "test_batch", "wb") as fh:
        pickle.dump({b"data": flat[n_tr:], b"labels": labels[n_tr:].tolist()},
                    fh)


def make_dsprites(out: Path, imgs) -> None:
    x64 = upscale(imgs, 8)  # (N, 64, 64)
    binary = (x64 > 127).astype(np.uint8)
    path = out / "dsprite" / "dsprites_64x64.npz"
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, imgs=binary)


def make_celeba(out: Path, imgs, n: int) -> None:
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "data"))
    ap.add_argument("--celeba-n", type=int, default=256)
    args = ap.parse_args()
    out = Path(args.out)

    imgs, labels = load_real_digits()
    rng = np.random.default_rng(0)
    order = rng.permutation(len(imgs))
    imgs, labels = imgs[order], labels[order]

    make_mnist(out, imgs, labels)
    make_cifar10(out, imgs, labels)
    make_dsprites(out, imgs)
    make_celeba(out, imgs, args.celeba_n)
    print(f"wrote real-digit datasets under {out} "
          f"(MNIST idx.gz, cifar-10-batches-py, dsprite npz, celeba jpgs)")


if __name__ == "__main__":
    main()
