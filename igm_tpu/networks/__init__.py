from . import base, basic, conv32, conv64, vqvae, unet  # noqa: F401
