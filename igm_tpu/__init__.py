"""igm_tpu — a TPU-native image-generation-models framework.

A from-scratch JAX/Flax/Optax/Pallas rebuild of the capabilities of the
reference PyTorch-Lightning zoo (Victarry/Image-Generation-models): 16
generative-model families (GAN/VAE/autoregressive/diffusion), a network zoo,
datamodules, visualization/eval callbacks, and a Hydra-compatible config
composer — all designed TPU-first:

- every training step is one jitted pure function over a ``jax.sharding.Mesh``
  (data-parallel by default), with multi-optimizer adversarial alternation
  expressed as ``lax.cond`` on the step counter;
- the slow Python sampling loops of the reference (DDPM's 1000-step ancestral
  chain, PixelCNN/MADE/TAR per-pixel loops) are ``lax.scan``-rolled;
- hot ops (codebook nearest-neighbour search, linear attention) have Pallas
  TPU kernels in ``igm_tpu.ops``.

Package layout (see SURVEY.md §7 for the blueprint):
  config/    Hydra-compatible YAML composer + instantiate()
  core/      Trainer, TrainState, optimizers, checkpointing, logging
  parallel/  mesh construction + shardings (DP over ICI; NCCL-free)
  networks/  Flax module zoo (MLP/DCGAN conv/VQ-VAE/UNet)
  models/    the 16 method families (jitted train/val/sample steps)
  ops/       Pallas TPU kernels + numerics helpers
  data/      host input pipeline (MNIST/CIFAR-10/CelebA/dSprites parsers)
  callbacks/ ValidationResult consumers (grids, traversal, FID, gif)
  utils/     losses, decoder distributions, toy GMM, logging helpers
"""

__version__ = "0.1.0"
