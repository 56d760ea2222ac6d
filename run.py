#!/usr/bin/env python
"""CLI entrypoint (parity: /root/reference/run.py).

    python run.py experiment=ddpm/cifar10 [model.lr=1e-3] [trainer.max_epochs=5]
    python run.py -m experiment=vae/mnist_mlp model.lr=1e-3,5e-4   # sweep

Composes configs/ (Hydra-compatible), chdirs into the per-run log dir
(logs/runs/<exp_name>), then calls igm_tpu.train.train.
"""
from __future__ import annotations

import itertools
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

from igm_tpu.config import compose, select  # noqa: E402
from igm_tpu.utils.utils import print_config  # noqa: E402


def _expand_multirun(overrides):
    """`a=1,2 b=x,y` -> cartesian product of single-value override lists."""
    keys, value_lists = [], []
    for ov in overrides:
        if "=" in ov and "," in ov.split("=", 1)[1]:
            k, v = ov.split("=", 1)
            keys.append(k)
            value_lists.append(v.split(","))
        else:
            keys.append(None)
            value_lists.append([ov])
    runs = []
    for combo in itertools.product(*value_lists):
        run = []
        for k, v in zip(keys, combo):
            run.append(f"{k}={v}" if k is not None else v)
        runs.append(run)
    return runs


def _single_run(overrides, multirun_subdir=None) -> None:
    cfg = compose(REPO_ROOT / "configs", overrides)
    if cfg.get("print_config"):
        print_config(cfg, resolve=True)
    run_dir = None
    try:
        if multirun_subdir is None:
            run_dir = str(select(cfg, "hydra.run.dir"))
        else:
            run_dir = os.path.join(str(select(cfg, "hydra.sweep.dir")),
                                   multirun_subdir)
    except KeyError:
        pass
    cwd = os.getcwd()
    chdir = bool(select(cfg, "hydra.job.chdir", True)) and run_dir
    try:
        if chdir:
            os.makedirs(run_dir, exist_ok=True)
            os.chdir(run_dir)
        from igm_tpu.train import train
        result = train(cfg)
        if result is not None:
            print(f"optimized_metric: {result}")
    finally:
        os.chdir(cwd)


def main() -> None:
    args = sys.argv[1:]
    multirun = False
    if args and args[0] in ("-m", "--multirun"):
        multirun = True
        args = args[1:]
    if multirun:
        runs = _expand_multirun(args)
        for i, run in enumerate(runs):
            print(f"--- multirun job {i}: {run}")
            _single_run(run, multirun_subdir=str(i))
    else:
        _single_run(args)


if __name__ == "__main__":
    main()
