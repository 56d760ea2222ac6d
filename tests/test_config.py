"""Config composer tests: reproduce Hydra's composition for the configs/ tree."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.config import compose, instantiate, select


def test_vae_mnist_mlp(config_dir):
    cfg = compose(config_dir, ["experiment=vae/mnist_mlp"])
    # experiment overlay wins over datamodule's conv_mnist networks override
    assert cfg.networks.encoder._target_.endswith("basic.MLPEncoder")
    assert cfg.model._target_.endswith("vae.VAE")
    assert cfg.model.latent_dim == 128
    assert cfg.datamodule.width == 28
    # interpolation into networks group
    assert cfg.networks.decoder.width == 28
    assert cfg.exp_name == "vae/mnist_mlp"
    # model-group interpolation of networks
    assert cfg.model.encoder._target_.endswith("basic.MLPEncoder")


def test_datamodule_networks_override(config_dir):
    # vae/mnist_conv does NOT override networks -> datamodule picks conv_mnist
    cfg = compose(config_dir, ["experiment=vae/mnist_conv"])
    assert cfg.networks.encoder._target_.endswith("basic.ConvEncoder")


def test_ddpm_cifar10(config_dir):
    cfg = compose(config_dir, ["experiment=ddpm/cifar10"])
    assert cfg.model.dim_mults == [1, 2, 4]
    assert cfg.trainer.max_epochs == 100
    assert cfg.trainer.check_val_every_n_epoch == 10
    assert cfg.datamodule.channels == 3
    # ddpm model config swaps callbacks to ar_models (sample+tqdm, no fid)
    assert "sample" in cfg.callbacks
    assert "eval_fid" not in cfg.callbacks


def test_default_callbacks(config_dir):
    cfg = compose(config_dir, ["experiment=vanilla_gan/cifar10"])
    assert set(cfg.callbacks) >= {"eval_fid", "latent_visual", "sample", "traverse"}


def test_cli_value_override(config_dir):
    cfg = compose(config_dir, ["experiment=vae/mnist_mlp", "model.lr=5e-4",
                               "datamodule.batch_size=32"])
    assert cfg.model.lr == 5e-4
    assert cfg.datamodule.batch_size == 32


def test_cli_group_override_beats_experiment(config_dir):
    cfg = compose(config_dir, ["experiment=vae/mnist_mlp", "networks=mlp_small"])
    assert cfg.networks.encoder.hidden_dims == [128, 256, 512]


def test_wgan_lr_interpolation(config_dir):
    cfg = compose(config_dir, ["experiment=wgan/cifar10"])
    assert cfg.model.lrG == 2e-4
    assert cfg.model.lrD == 2e-4
    assert cfg.exp_name == "wgan/cifar10_lr_0.0002"


def test_dangling_interpolation_is_lenient(config_dir):
    cfg = compose(config_dir, ["experiment=age/mnist"])
    assert "z0" in cfg.exp_name and "x10" in cfg.exp_name


def test_add_and_delete_override(config_dir):
    cfg = compose(config_dir, ["experiment=vae/mnist_mlp", "+model.extra=7",
                               "~model.beta"])
    assert cfg.model.extra == 7
    assert "beta" not in cfg.model


def test_instantiate_alias():
    from igm_tpu.config.instantiate import resolve_target
    import igm_tpu.utils.losses as losses
    assert resolve_target("src.utils.losses.adversarial_loss") is losses.adversarial_loss


def test_all_experiments_compose(config_dir):
    exps = sorted(
        str(p.relative_to(config_dir / "experiment")).removesuffix(".yaml")
        for p in (config_dir / "experiment").rglob("*.yaml")
    )
    assert len(exps) >= 53
    for e in exps:
        cfg = compose(config_dir, [f"experiment={e}"])
        assert "_target_" in cfg.model, e
        assert "_target_" in cfg.datamodule, e
