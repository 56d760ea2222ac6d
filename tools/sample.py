#!/usr/bin/env python
"""Generate a sample grid from a trained checkpoint (inference CLI) —
thin shim over igm_tpu.cli.sample_main, which also backs the installed
``igm-sample`` console script (pyproject.toml).

    python tools/sample.py experiment=vae/mnist_mlp \
        --ckpt logs/runs/vae/mnist_mlp/checkpoints [--n 64] [--out grid.png]
        [--label 3]   # conditional models: all n samples from one class

Composes the experiment config, restores the orbax checkpoint, runs the
model's (jitted) sampler, and writes a grid image — the standalone
inference path the reference never had (its sampling only ran inside
Lightning validation).
"""
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("IGM_CONFIG_DIR", str(REPO / "configs"))

from igm_tpu.cli import sample_main  # noqa: E402

if __name__ == "__main__":
    sample_main()
