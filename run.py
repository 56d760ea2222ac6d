#!/usr/bin/env python
"""CLI entrypoint (parity: /root/reference/run.py) — thin shim over
igm_tpu.cli.train_main, which also backs the installed ``igm-train``
console script (pyproject.toml).

    python run.py experiment=ddpm/cifar10 [model.lr=1e-3] [trainer.max_epochs=5]
    python run.py -m experiment=vae/mnist_mlp model.lr=1e-3,5e-4       # grid sweep
    python run.py -m hydra/sweeper=optuna hydra.sweeper.n_trials=20 \
        experiment=vae/mnist_mlp 'model.lr=tag(log, interval(1e-4,1e-2))'  # TPE
"""
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("IGM_CONFIG_DIR", str(REPO_ROOT / "configs"))

from igm_tpu.cli import train_main  # noqa: E402

if __name__ == "__main__":
    train_main()
