"""End-to-end smoke tests: compose config -> train N batches -> validate.

The reference's only smoke mechanism is Lightning fast_dev_run
(SURVEY.md §4); these tests are its equivalent, one per model family,
running on the 8-device CPU mesh with synthetic data.
"""
import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.config import compose  # noqa: E402
from igm_tpu.train import train  # noqa: E402

pytestmark = pytest.mark.slow  # full train->val smokes, ~3.5 min total

FAST = [
    "trainer.max_epochs=1",
    "trainer.limit_train_batches=3",
    "trainer.limit_val_batches=1",
    "trainer.log_every_n_steps=1",
    "trainer.enable_checkpointing=False",
    "datamodule.batch_size=16",
    "print_config=False",
]

# every model family x its cheapest dataset config (SURVEY.md §2 matrix)
SMOKE_EXPERIMENTS = [
    "vae/mnist_mlp",
    "vae/mnist_conv",
    "beta_vae/dsprites",
    "cvae/mnist",
    "vanilla_gan/mnist_mlp",
    "vanilla_gan/mnist_conv",
    "lsgan/cifar10",      # conv_32 nets + synthetic CIFAR + FID callback
    "lsgan/conv_mnist",
    "ggan/mnist_conv",
    "wgan/mnist_conv",
    "wgan_gp/mnist_conv",
    "infogan/mnist",
    "bigan/mnist",
    "aae/mnist",
    "age/mnist",
    "factor_vae/dsprites",
    "vaegan/mnist",
    "vqvae/mnist",
    "made/mnist",
    "pixelcnn/mnist",
    "tar/mnist",
    "ddpm/mnist",
    "ddpm/cifar10",
    "ddpm/cond_mnist",   # class-conditional + CFG (beyond parity)
    "latent_ddpm/mnist",  # latent diffusion over a VQ-VAE (beyond parity)
    "flow/cond_mnist",   # flow matching + CFG (beyond parity)
    "realnvp/mnist",     # exact-likelihood flow (beyond parity)
    "edm/mnist",         # sigma-space EDM + Heun sampler (beyond parity)
    "consistency/mnist",  # consistency training, 1-2 step gen (beyond parity)
    "score_sde/mnist",   # VE score-SDE + PC sampler (beyond parity)
    "score_sde/mnist_vp",  # VP score-SDE (DDPM's continuous-time limit)
    "distill/mnist",     # progressive distillation phase (beyond parity)
]


def _run(config_dir, tmp_path, experiment, extra=()):
    overrides = [f"experiment={experiment}", *FAST, *extra]
    cfg = compose(config_dir, overrides)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        train(cfg)
    finally:
        os.chdir(cwd)


@pytest.mark.parametrize("experiment", SMOKE_EXPERIMENTS)
def test_smoke(config_dir, tmp_path, experiment):
    extra = []
    if experiment.startswith(("ddpm", "latent_ddpm")):
        # tiny UNet + short chain so the scan sampler stays fast on CPU
        extra = ["model.hidden_dim=16", "model.timesteps=8",
                 "datamodule.batch_size=8", "+model.sample_batch=8"]
    if experiment.startswith(("flow", "edm", "consistency", "score_sde")):
        extra = ["model.hidden_dim=16", "model.sample_steps=3",
                 "datamodule.batch_size=8", "+model.sample_batch=8"]
    if experiment.startswith("distill"):
        # one halving phase from a random (ckpt-less) teacher: exercises
        # the frozen-teacher train step + the student-grid sampler
        extra = ["model.hidden_dim=16", "model.timesteps=16",
                 "model.student_steps=2", "datamodule.batch_size=8",
                 "+model.sample_batch=8"]
    if experiment.startswith("realnvp"):
        extra = ["model.hidden_dim=16", "datamodule.batch_size=8",
                 "+model.sample_batch=8"]
    if experiment.startswith(("pixelcnn", "made", "tar")):
        extra = ["datamodule.batch_size=8"]
        if experiment.startswith("pixelcnn"):
            extra.append("model.hidden_dim=8")
        if experiment.startswith("made"):
            extra.append("model.hidden_dim=64")
        if experiment.startswith("tar"):
            extra += ["model.d_model=32", "model.num_layers=1"]
    _run(config_dir, tmp_path, experiment, extra)


def test_speed_gan_via_group_overrides(config_dir, tmp_path):
    """speed_gan has no experiment yaml in the reference either; users select
    it by group overrides — exercises experiment-less composition."""
    cfg = compose(config_dir, ["model=speed_gan", "networks=conv_mnist",
                               "datamodule=mnist", *FAST])
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        train(cfg)
    finally:
        os.chdir(cwd)


def test_checkpoint_resume(config_dir, tmp_path):
    cfg = compose(config_dir, [
        "experiment=vae/mnist_mlp", "trainer.max_epochs=1",
        "trainer.limit_train_batches=2", "trainer.limit_val_batches=1",
        "datamodule.batch_size=16", "print_config=False",
    ])
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        train(cfg)
        assert (tmp_path / "checkpoints").exists()
        # resume: runs remaining epochs (none) without error
        cfg2 = compose(config_dir, [
            "experiment=vae/mnist_mlp", "trainer.max_epochs=2",
            "trainer.limit_train_batches=2", "trainer.limit_val_batches=1",
            "datamodule.batch_size=16", "print_config=False",
            f"trainer.resume={tmp_path / 'checkpoints'}",
        ])
        train(cfg2)
    finally:
        os.chdir(cwd)


def test_phase_alternating_metrics_visible_with_even_log_stride(config_dir, tmp_path):
    """Even log_every_n_steps must still observe BOTH GAN phases: the
    trainer samples two consecutive steps per window (d_loss lives on odd
    steps under the lax.cond alternation and was invisible before)."""
    import glob
    import re

    _run(config_dir, tmp_path, "vanilla_gan/mnist_mlp",
         extra=["trainer.limit_train_batches=8", "trainer.log_every_n_steps=4"])
    tags = set()
    for f in glob.glob(str(tmp_path / "**" / "events*"), recursive=True):
        with open(f, "rb") as fh:
            tags |= {m.group().decode()
                     for m in re.finditer(rb"train_loss/\w+", fh.read())}
    assert "train_loss/g_loss" in tags
    assert "train_loss/d_loss" in tags
