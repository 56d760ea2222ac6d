#!/usr/bin/env python
"""Package REAL image data into the real datasets' container formats.

Thin CLI over ``igm_tpu.data.packaged`` (the library version is what
``prepare_data()`` calls when real bytes are required but absent — the
zero-egress replacement for torchvision downloads).  See that module's
docstring for the format details; the packaged sets are small (1.8k real
handwritten-digit scans) — they exist to prove the parsers and to give
convergence tests real data, not to reproduce paper numbers.

Usage: python tools/make_real_datasets.py [--out ./data] [--celeba-n 256]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from igm_tpu.data import packaged  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "data"))
    ap.add_argument("--celeba-n", type=int, default=packaged.CELEBA_N)
    args = ap.parse_args()
    out = Path(args.out)

    imgs, labels = packaged.load_real_digits()
    packaged.make_mnist(out, imgs, labels)
    packaged.make_cifar10(out, imgs, labels)
    packaged.make_dsprites(out, imgs)
    packaged.make_celeba(out, imgs, args.celeba_n)
    print(f"wrote real-digit datasets under {out} "
          f"(MNIST idx.gz, cifar-10-batches-py, dsprite npz, celeba jpgs)")


if __name__ == "__main__":
    main()
