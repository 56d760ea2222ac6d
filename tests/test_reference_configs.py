"""Drop-in compatibility with the REFERENCE's own configs/ tree.

The composer + target aliasing (igm_tpu/config/instantiate.py) must compose
/root/reference/configs verbatim and instantiate runnable igm_tpu objects —
a user can point run.py at their existing reference config tree.
"""
import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.config import compose, instantiate  # noqa: E402

REF_CONFIGS = Path("/root/reference/configs")

pytestmark = pytest.mark.skipif(not REF_CONFIGS.exists(),
                                reason="reference tree not mounted")


def test_reference_tree_composes_and_instantiates():
    cfg = compose(REF_CONFIGS, ["experiment=vae/mnist_mlp",
                                "print_config=False"])
    assert cfg.model._target_ == "src.models.vae.VAE"
    dm = instantiate(cfg.datamodule)
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    from igm_tpu.models.vae import VAE
    from igm_tpu.data.mnist import MNISTDataModule
    assert isinstance(model, VAE)
    assert isinstance(dm, MNISTDataModule)


@pytest.mark.parametrize("experiment", [
    "ddpm/cifar10", "wgan_gp/mnist_conv", "vqvae/cifar10", "infogan/mnist",
    "pixelcnn/mnist", "tar/mnist", "factor_vae/dsprites", "aae/mnist",
])
def test_reference_experiments_instantiate(experiment):
    cfg = compose(REF_CONFIGS, [f"experiment={experiment}",
                                "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    assert hasattr(model, "train_step")


@pytest.mark.slow
def test_reference_tree_trains_end_to_end(tmp_path):
    """Full train loop driven by the reference's own yaml files."""
    from igm_tpu.train import train

    cfg = compose(REF_CONFIGS, [
        "experiment=vae/mnist_mlp", "print_config=False",
        "+trainer.max_epochs=1", "+trainer.limit_train_batches=2",
        "+trainer.limit_val_batches=1", "datamodule.batch_size=16",
        "+trainer.enable_checkpointing=False",
    ])
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        train(cfg)
    finally:
        os.chdir(cwd)
