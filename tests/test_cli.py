"""CLI contract tests: `python run.py experiment=... overrides` + multirun.

Runs run.py as a real subprocess (the exact user entrypoint) on CPU.
"""
import os
import subprocess
import sys
import pytest
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FAST = ["trainer.max_epochs=1", "trainer.limit_train_batches=2",
        "trainer.limit_val_batches=1", "datamodule.batch_size=16",
        "trainer.enable_checkpointing=False", "print_config=False"]


def _env():
    env = dict(os.environ)
    env.update(IGM_PLATFORM="cpu", IGM_SYNTHETIC_DATA="1",
               JAX_PLATFORMS="cpu")
    return env


def test_cli_single_run(tmp_path):
    out = subprocess.run(
        [sys.executable, str(REPO / "run.py"), "experiment=vae/mnist_mlp",
         *FAST, f"hydra.run.dir={tmp_path}/run"],
        capture_output=True, text=True, env=_env(), timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    run_dir = tmp_path / "run"
    assert (run_dir / "results").exists() or (run_dir / "tensorboard").exists()


@pytest.mark.slow
def test_cli_multirun(tmp_path):
    out = subprocess.run(
        [sys.executable, str(REPO / "run.py"), "-m",
         "experiment=vae/mnist_mlp", "model.lr=1e-3,5e-4", *FAST,
         f"hydra.sweep.dir={tmp_path}/sweep"],
        capture_output=True, text=True, env=_env(), timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "multirun job 0" in out.stdout and "multirun job 1" in out.stdout
    assert (tmp_path / "sweep" / "0").exists()
    assert (tmp_path / "sweep" / "1").exists()


@pytest.mark.slow
def test_seed_determinism(config_dir, tmp_path):
    """Same seed -> identical params after training (reference runs are
    non-reproducible by default, SURVEY.md §8; ours are deterministic)."""
    import jax
    from igm_tpu.config import compose
    from igm_tpu.config.instantiate import instantiate
    from igm_tpu.train import train

    def run(subdir):
        cfg = compose(config_dir, ["experiment=vae/mnist_mlp", *FAST])
        cwd = os.getcwd()
        d = tmp_path / subdir
        d.mkdir()
        os.chdir(d)
        try:
            dm = instantiate(cfg.datamodule)
            model = instantiate(cfg.model, datamodule=cfg.datamodule)
            trainer = instantiate(cfg.trainer, callbacks=[], logger=None)
            trainer.fit(model, dm)
            return jax.device_get(trainer.state.params)
        finally:
            os.chdir(cwd)

    p1, p2 = run("a"), run("b")
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)
