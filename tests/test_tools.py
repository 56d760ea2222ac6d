"""Inference CLI tools: train a tiny checkpoint, then sample + eval FID."""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
import pytest

pytestmark = pytest.mark.slow  # subprocess CLI round-trips


def _env():
    env = dict(os.environ)
    env.update(IGM_PLATFORM="cpu", IGM_SYNTHETIC_DATA="1",
               JAX_PLATFORMS="cpu")
    return env


def test_sample_and_eval_fid_tools(tmp_path):
    # 1) train a tiny VAE and leave a checkpoint behind
    run = subprocess.run(
        [sys.executable, str(REPO / "run.py"), "experiment=vae/mnist_mlp",
         "trainer.max_epochs=1", "trainer.limit_train_batches=2",
         "trainer.limit_val_batches=1", "datamodule.batch_size=16",
         "print_config=False", f"hydra.run.dir={tmp_path}/run"],
        capture_output=True, text=True, env=_env(), timeout=300)
    assert run.returncode == 0, run.stderr[-2000:]
    ckpt = tmp_path / "run" / "checkpoints"
    assert ckpt.exists()

    # 2) sample grid from the checkpoint
    out_png = tmp_path / "grid.png"
    run = subprocess.run(
        [sys.executable, str(REPO / "tools" / "sample.py"),
         "experiment=vae/mnist_mlp", "--ckpt", str(ckpt), "--n", "16",
         "--out", str(out_png)],
        capture_output=True, text=True, env=_env(), timeout=300)
    assert run.returncode == 0, run.stderr[-2000:]
    assert out_png.exists() and out_png.stat().st_size > 0

    # 3) standalone FID eval (random backend; synthetic val data); first
    # call computes + caches the real-split stats, second call must load
    # them and produce the identical number (the one-command path a future
    # Inception-weights drop rides)
    stats_dir = tmp_path / "fid_stats"
    results = []
    for _ in range(2):
        run = subprocess.run(
            [sys.executable, str(REPO / "tools" / "eval_fid.py"),
             "experiment=vae/mnist_mlp", "--ckpt", str(ckpt), "--n", "32",
             "--batch", "16", "--stats-dir", str(stats_dir)],
            capture_output=True, text=True, env=_env(), timeout=300)
        assert run.returncode == 0, run.stderr[-2000:]
        results.append(json.loads(run.stdout.strip().splitlines()[-1]))
    first, second = results
    assert "fid" in first and first["n_fake"] >= 32
    assert first["real_stats"] == "computed"
    assert second["real_stats"] == "cached"
    assert second["fid"] == first["fid"]
    assert any(stats_dir.iterdir())
