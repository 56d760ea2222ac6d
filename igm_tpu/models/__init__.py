"""Model zoo — one module per method family (SURVEY.md §2 models table).

Modules are imported lazily by the config layer (``_target_`` paths); this
listing is for interactive use::

    from igm_tpu.models import vae, gan, ddpm, ...
"""

__all__ = [
    "aae", "age", "base", "BiGAN", "consistency", "cvae", "ddpm", "distill", "edm",
    "factor_vae",
    "flow_matching", "gan", "info_gan", "latent_ddpm", "made", "pixelcnn",
    "realnvp", "score_sde", "speed_gan", "tar", "vae", "vae_gan", "vqvae", "wgan",
    "wgan_gp",
]
