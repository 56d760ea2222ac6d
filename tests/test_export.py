"""Serving-export tests: jax.export artifact round-trip (tools/export.py).

The artifact must run with NO model/config code - deserialize + call only.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _env():
    env = dict(os.environ)
    env.update(IGM_PLATFORM="cpu", IGM_SYNTHETIC_DATA="1",
               JAX_PLATFORMS="cpu")
    return env


@pytest.mark.slow
def test_export_roundtrip_vae(tmp_path):
    art = tmp_path / "vae.jaxexport"
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "export.py"),
         "experiment=vae/mnist_mlp", "--n", "4", "--platforms", "cpu",
         "--out", str(art)],
        capture_output=True, text=True, env=_env(), timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert art.exists() and art.stat().st_size > 1000
    meta = json.loads((tmp_path / "vae.jaxexport.json").read_text())
    assert meta["n"] == 4 and meta["platforms"] == ["cpu"]

    # run the artifact WITHOUT the framework: plain jax deserialize+call
    import jax
    from jax import export as jexport
    exported = jexport.deserialize(art.read_bytes())
    imgs = np.asarray(exported.call(jax.random.PRNGKey(1)))
    assert imgs.shape[0] == 4 and imgs.ndim == 4
    assert np.isfinite(imgs).all()
    # different seeds -> different samples (sampler actually uses the key)
    imgs2 = np.asarray(exported.call(jax.random.PRNGKey(2)))
    assert not np.allclose(imgs, imgs2)


@pytest.mark.slow
def test_export_run_cli(tmp_path):
    art = tmp_path / "vae.jaxexport"
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "export.py"),
         "experiment=vae/mnist_mlp", "--n", "4", "--platforms", "cpu",
         "--out", str(art)],
        capture_output=True, text=True, env=_env(), timeout=600, check=True)
    grid = tmp_path / "grid.png"
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "export.py"),
         "--run", str(art), "--seed", "3", "--out", str(grid)],
        capture_output=True, text=True, env=_env(), timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "output (4," in out.stdout.replace("(4, ", "(4,"), out.stdout
    assert grid.exists() and grid.stat().st_size > 100


@pytest.mark.slow
def test_export_fast_sampler_ddpm(tmp_path):
    """--sampler dpm exports the 2nd-order fast sampler (serving path for
    diffusion: ~steps model evals instead of the full ancestral chain)."""
    art = tmp_path / "ddpm.jaxexport"
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "export.py"),
         "experiment=ddpm/mnist", "model.hidden_dim=8",
         "model.dim_mults=[1,2]", "model.timesteps=8",
         "--n", "2", "--sampler", "dpm", "--steps", "4",
         "--platforms", "cpu", "--out", str(art)],
        capture_output=True, text=True, env=_env(), timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    meta = json.loads((tmp_path / "ddpm.jaxexport.json").read_text())
    assert meta["sampler"] == "dpm"

    import jax
    from jax import export as jexport
    exported = jexport.deserialize(art.read_bytes())
    imgs = np.asarray(exported.call(jax.random.PRNGKey(1)))
    assert imgs.shape == (2, 28, 28, 1)
    assert np.isfinite(imgs).all()


def test_export_unknown_sampler_fails_loudly(tmp_path):
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "export.py"),
         "experiment=vae/mnist_mlp", "--n", "2", "--sampler", "dpm",
         "--platforms", "cpu", "--out", str(tmp_path / "x.jaxexport")],
        capture_output=True, text=True, env=_env(), timeout=600)
    assert out.returncode != 0
    assert "has no dpm_sample" in out.stderr


@pytest.mark.slow
def test_export_consistency_one_step(tmp_path):
    """--sampler multistep --steps 1: single-eval consistency generation as
    a serving artifact (the endpoint of the fast-sampler ladder)."""
    art = tmp_path / "cm.jaxexport"
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "export.py"),
         "experiment=consistency/mnist", "model.hidden_dim=8",
         "model.dim_mults=[1,2]", "model.n_grid=8",
         "--n", "2", "--sampler", "multistep", "--steps", "1",
         "--platforms", "cpu", "--out", str(art)],
        capture_output=True, text=True, env=_env(), timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    meta = json.loads((tmp_path / "cm.jaxexport.json").read_text())
    assert meta["sampler"] == "multistep"

    import jax
    from jax import export as jexport
    exported = jexport.deserialize(art.read_bytes())
    imgs = np.asarray(exported.call(jax.random.PRNGKey(1)))
    assert imgs.shape == (2, 28, 28, 1)
    assert np.isfinite(imgs).all()


@pytest.mark.slow
def test_export_edm_heun(tmp_path):
    """--sampler heun with the model's own sample_steps (no --steps):
    EDM Karras-grid Heun sampling as a serving artifact."""
    art = tmp_path / "edm.jaxexport"
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "export.py"),
         "experiment=edm/mnist", "model.hidden_dim=8",
         "model.dim_mults=[1,2]", "model.sample_steps=3",
         "--n", "2", "--sampler", "heun",
         "--platforms", "cpu", "--out", str(art)],
        capture_output=True, text=True, env=_env(), timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]

    import jax
    from jax import export as jexport
    exported = jexport.deserialize(art.read_bytes())
    imgs = np.asarray(exported.call(jax.random.PRNGKey(1)))
    assert imgs.shape == (2, 28, 28, 1)
    assert np.isfinite(imgs).all()


@pytest.mark.slow
def test_export_flow_matching(tmp_path):
    """Flow-matching ODE sampler (model default) as a serving artifact."""
    art = tmp_path / "flow.jaxexport"
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "export.py"),
         "experiment=flow/mnist", "model.hidden_dim=8",
         "model.dim_mults=[1,2]", "model.sample_steps=3",
         "--n", "2", "--platforms", "cpu", "--out", str(art)],
        capture_output=True, text=True, env=_env(), timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]

    import jax
    from jax import export as jexport
    exported = jexport.deserialize(art.read_bytes())
    imgs = np.asarray(exported.call(jax.random.PRNGKey(1)))
    assert imgs.shape == (2, 28, 28, 1)
    assert np.isfinite(imgs).all()


@pytest.mark.slow
def test_export_score_sde_pc(tmp_path):
    """--sampler pc: the score-SDE Predictor-Corrector reverse-SDE chain as
    a serving artifact (stochastic sampler — the key drives the SDE)."""
    art = tmp_path / "sde.jaxexport"
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "export.py"),
         "experiment=score_sde/mnist", "model.hidden_dim=8",
         "model.dim_mults=[1,2]",
         "--n", "2", "--sampler", "pc", "--steps", "3",
         "--platforms", "cpu", "--out", str(art)],
        capture_output=True, text=True, env=_env(), timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    meta = json.loads((tmp_path / "sde.jaxexport.json").read_text())
    assert meta["sampler"] == "pc"

    import jax
    from jax import export as jexport
    exported = jexport.deserialize(art.read_bytes())
    imgs = np.asarray(exported.call(jax.random.PRNGKey(1)))
    assert imgs.shape == (2, 28, 28, 1)
    assert np.isfinite(imgs).all()
    # stochastic chain: different keys must give different samples
    imgs2 = np.asarray(exported.call(jax.random.PRNGKey(2)))
    assert not np.allclose(imgs, imgs2)


@pytest.mark.slow
def test_export_latent_ddpm_carries_calibrated_scale(tmp_path):
    """Latent-DDPM serving: a short training run calibrates
    latent_scale=auto (the resolved scale lives in ckpt mutables, round
    5b), and the export bakes THAT state — the artifact must reproduce
    the framework's own sampler bit-for-bit on the same key.  If the
    calibrated scale (or the no-clip latent sampler, x0_bound=0) were
    dropped anywhere along ckpt -> export, the decode path divides by a
    different scale and this equality breaks."""
    ov = ["experiment=latent_ddpm/mnist", "model.hidden_dim=8",
          "model.timesteps=8", "model.latent_dim=8",
          "model.num_embeddings=16"]
    out = subprocess.run(
        [sys.executable, str(REPO / "run.py"), *ov,
         "trainer.max_epochs=1", "trainer.limit_train_batches=2",
         "trainer.limit_val_batches=1", "datamodule.batch_size=4",
         "print_config=False"],
        capture_output=True, text=True, env=_env(), timeout=600,
        cwd=tmp_path)
    assert out.returncode == 0, out.stderr[-2000:]
    ckpt = next(tmp_path.glob("logs/runs/latent_ddpm/mnist/checkpoints"))

    art = tmp_path / "latent.jaxexport"
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "export.py"), *ov,
         "--ckpt", str(ckpt), "--n", "2", "--platforms", "cpu",
         "--out", str(art)],
        capture_output=True, text=True, env=_env(), timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]

    import jax
    from jax import export as jexport
    from igm_tpu.config import compose, instantiate
    from igm_tpu.core.checkpoint import CheckpointManager

    exported = jexport.deserialize(art.read_bytes())
    key = jax.random.PRNGKey(7)
    imgs = np.asarray(exported.call(key))
    assert imgs.shape == (2, 28, 28, 1) and np.isfinite(imgs).all()

    cfg = compose(REPO / "configs", [*ov, "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    model.steps_per_epoch = 1
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    state = CheckpointManager(str(ckpt)).restore(state)
    scale = float(state.mutables["latent"]["scale"])
    assert scale != 1.0  # auto-calibration actually resolved a scale
    ref = np.asarray(model.sample(state, key, 2))
    np.testing.assert_allclose(imgs, ref, rtol=1e-5, atol=1e-5)
