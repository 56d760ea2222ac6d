"""Latent diffusion: DDPM over a frozen VQ-VAE's continuous latent space.

Beyond-parity family (the reference has VQ-VAE `src/models/vqvae.py` and
pixel-space DDPM `src/models/ddpm.py:294-521` but never composes them).
This is the VQ-regularised latent-diffusion recipe (Rombach et al. 2022,
"High-Resolution Image Synthesis with Latent Diffusion Models"): a
pretrained VQ-VAE encoder maps images to a 4x-downsampled continuous
latent grid, the DDPM learns the distribution of those latents
(epsilon-prediction, same schedules/samplers — everything is inherited
from DDPM including EMA, DDIM and classifier-free guidance), and decoding
quantises through the codebook before the convolutional decoder — exactly
the VQ-VAE's own eval path.

TPU economics: a (H/4, W/4, D) latent UNet step is ~16x fewer conv FLOPs
per image than pixel space at equal width, and the frozen encoder is one
extra forward fused into the same jitted train step (no host round-trip,
no second program).

The first stage arrives via ``first_stage_ckpt`` (an orbax dir written by
``experiment=vqvae/*``).  Its params/batch-stats are spliced into this
model's TrainState (frozen: no optimizer owns them), so the latent-DDPM
checkpoint is fully self-contained afterwards.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import instantiate
from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam
from ..core.state import TrainState
from ..ops import diffusion as gd
from .ddpm import DDPM
from .vqvae import VectorQuantizer

_FIRST_STAGE = ("encoder", "decoder", "vq")


class LatentDDPM(DDPM):
    def __init__(self, datamodule: Any, encoder: Any = None,
                 decoder: Any = None, latent_dim: int = 64,
                 num_embeddings: int = 512, first_stage_ckpt: str = "",
                 latent_scale="auto", codebook_update: str = "gradient",
                 **ddpm_kwargs):
        self._latent_dim = int(latent_dim)
        super().__init__(datamodule, **ddpm_kwargs)
        # latent_scale: a float fixes the scale; "auto" (or 0) calibrates
        # to 1/std of the encoder latents at fit start (on_fit_start).
        self._cfg_scale = 0.0 if str(latent_scale) == "auto" \
            else float(latent_scale)
        self.save_hyperparameters(latent_dim=self._latent_dim,
                                  num_embeddings=int(num_embeddings),
                                  latent_scale=self._cfg_scale,
                                  codebook_update=str(codebook_update),
                                  first_stage_ckpt=str(first_stage_ckpt or ""))
        self.latent_h = self.height // 4   # vqvae nets downsample 4x
        self.latent_w = self.width // 4
        self.modules = ModuleDict(
            denoise=self.modules["denoise"],
            encoder=instantiate(encoder, input_channel=self.channels,
                                output_channel=self._latent_dim),
            decoder=instantiate(decoder, input_channel=self._latent_dim,
                                output_channel=self.channels),
            vq=VectorQuantizer(int(num_embeddings), self._latent_dim,
                               ema=(codebook_update == "ema")))

    # ----------------------------------------------------- DDPM space hooks
    @property
    def x0_bound(self) -> float:
        """0 = no implied-x0 clipping: the diffusion space is the
        calibrated unit-variance latent space, which is unbounded — with
        latent_scale=auto ~32% of latent values lie outside [-1, 1] and
        the pixel-space clip was measured to collapse samples to gray
        noise (round-5b gallery, NOTES.md).  Matches the LDM recipe
        (Rombach et al. 2022: no clip_denoised in latent space)."""
        return 0.0

    @property
    def denoise_channels(self) -> int:
        return self._latent_dim

    def _sample_shape(self, n: int) -> tuple:
        return (n, self.latent_h, self.latent_w, self._latent_dim)

    def _to_diffusion_space(self, state, imgs: jnp.ndarray) -> jnp.ndarray:
        # the first stage is frozen; stop_gradient keeps the (unowned)
        # encoder out of the denoiser's grad graph explicitly
        return jax.lax.stop_gradient(self.encode(state, imgs))

    # -------------------------------------------------------- first stage
    def _scale(self, state: TrainState) -> jnp.ndarray:
        """The resolved latent scale.

        Lives in ``state.mutables['latent']['scale']`` (NOT hparams) so it
        rides orbax checkpoints into the sampling/export/serve tools —
        ``latent_scale=auto`` is resolved once at fit start (on_fit_start)
        and every later consumer restores the calibrated value.
        """
        return state.mutables["latent"]["scale"]

    def encode(self, state: TrainState, imgs: jnp.ndarray) -> jnp.ndarray:
        z, _ = self.modules.apply("encoder", state.params, state.mutables,
                                  imgs, train=False)
        return z * self._scale(state)

    def decode(self, state: TrainState, z: jnp.ndarray) -> jnp.ndarray:
        z = z / self._scale(state)
        (quant, _vq, _c, _idx), _ = self.modules.apply(
            "vq", state.params, state.mutables, z, train=False)
        imgs, _ = self.modules.apply("decoder", state.params, state.mutables,
                                     quant, train=False)
        return imgs.reshape(z.shape[0], self.height, self.width,
                            self.channels)

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        # only the denoiser trains; the first stage has no optimizer
        self.optimizers = OptimizerSet().add(
            "opt", adam(hp.lr, hp.b1, hp.b2), ["denoise"])
        zlat = jnp.zeros((1, self.latent_h, self.latent_w, self._latent_dim))
        dummy = (zlat, jnp.zeros((1,)))
        if self.num_classes:
            dummy = dummy + (jnp.zeros((1,), jnp.int32),)
        state = self.make_state(rng, {
            "denoise": dummy,
            "encoder": (self.dummy_image_batch(1),),
            "decoder": (zlat,),
            "vq": (zlat,),
        })
        if hp.ema_decay > 0:
            state = state.replace(opt_states={
                **state.opt_states, "ema": state.params["denoise"]})
        # resolved latent scale (auto -> 1.0 until on_fit_start calibrates);
        # kept in mutables so checkpoints carry the calibrated value.
        state = state.replace(mutables={
            **state.mutables,
            "latent": {"scale": jnp.asarray(
                self._cfg_scale if self._cfg_scale > 0 else 1.0,
                jnp.float32)}})
        ckpt = str(hp.first_stage_ckpt or "")
        if ckpt:
            state = self._load_first_stage(state, ckpt)
        return state

    def on_fit_start(self, state: TrainState, train_arrays) -> TrainState:
        """``latent_scale=auto`` (configured as 0): set the scale to
        1/std of the frozen encoder's latents over the first training
        images — the LDM/Stable-Diffusion ``scale_factor`` recipe
        (Rombach et al. 2022 §G), so the diffusion prior sees unit-variance
        data and the noise schedule's SNR ladder is calibrated.  Measured
        motivation: the round-5 first-stage retrain (recon 0.198 -> 0.0146)
        CHANGED the encoder's output scale and the fixed scale=1.0 gallery
        regressed in coverage (benchmarks/real_runs/latent_ddpm_mnist).
        Deterministic given the same first stage + dataset, so resume
        recomputes the identical value before the checkpoint overwrites it.
        """
        if self._cfg_scale > 0:
            return state
        imgs = jnp.asarray(train_arrays[0][:256])

        @jax.jit
        def _std(st, im):
            z, _ = self.modules.apply("encoder", st.params, st.mutables,
                                      self.preprocess(im), train=False)
            return jnp.std(z)

        std = jnp.maximum(_std(state, imgs), 1e-6)
        scale = 1.0 / std
        import logging
        logging.getLogger(__name__).info(
            "latent_scale=auto: encoder latent std %.4f -> scale %.4f",
            float(std), float(scale))
        return state.replace(mutables={
            **state.mutables,
            "latent": {"scale": scale.astype(jnp.float32)}})

    def _load_first_stage(self, state: TrainState, ckpt: str) -> TrainState:
        from ..core.checkpoint import CheckpointManager
        raw = CheckpointManager(ckpt).restore_raw()
        params = dict(state.params)
        mutables = dict(state.mutables)
        for name in _FIRST_STAGE:
            if name not in raw["params"]:
                raise ValueError(f"first_stage_ckpt {ckpt} has no '{name}' "
                                 "params - not a vqvae checkpoint?")
            have = jax.tree_util.tree_map(lambda x: jnp.shape(x),
                                          params[name])
            got = jax.tree_util.tree_map(lambda x: jnp.shape(x),
                                         raw["params"][name])
            if have != got:
                raise ValueError(
                    f"first-stage '{name}' shape mismatch (config vs "
                    f"checkpoint):\n  config    {have}\n  checkpoint {got}")
            params[name] = raw["params"][name]
            if name in raw.get("mutables", {}):
                mutables[name] = raw["mutables"][name]
        return state.replace(params=params, mutables=mutables)

    # -------------------------------------------------------------- output
    def sample(self, state: TrainState, rng: jax.Array, n: int,
               y=None) -> jnp.ndarray:
        return self.decode(state, super().sample(state, rng, n, y=y))

    def ddim_sample(self, state: TrainState, rng: jax.Array, n: int,
                    steps: int = 50, eta: float = 0.0,
                    y=None, guidance: float = 1.0) -> jnp.ndarray:
        z = super().ddim_sample(state, rng, n, steps=steps, eta=eta,
                                y=y, guidance=guidance)
        return self.decode(state, z)

    def dpm_sample(self, state: TrainState, rng: jax.Array, n: int,
                   steps: int = 20, y=None, guidance: float = 1.0,
                   schedule: str | None = None) -> jnp.ndarray:
        z = super().dpm_sample(state, rng, n, steps=steps, y=y,
                               guidance=guidance, schedule=schedule)
        return self.decode(state, z)

    def inpaint(self, state, rng, x0, mask, resample: int = 1,
                y=None, guidance: float = 1.0) -> jnp.ndarray:
        """Latent-space RePaint: encode the known image, inpaint in latent
        space with the pixel mask min-pooled to the latent grid (a latent
        cell counts as known only if EVERY pixel it covers is known — holes
        expand, never shrink), decode, then composite the known pixels back
        exactly.  ``mask``/``x0`` are pixel-space like DDPM.inpaint."""
        mask = jnp.broadcast_to(mask, x0.shape).astype(x0.dtype)
        n, h, w = x0.shape[0], x0.shape[1], x0.shape[2]
        fh, fw = h // self.latent_h, w // self.latent_w
        zmask = (mask.min(axis=-1)
                 .reshape(n, self.latent_h, fh, self.latent_w, fw)
                 .min(axis=(2, 4))[..., None])
        z0 = self._to_diffusion_space(state, x0)
        z = super().inpaint(state, rng, z0, zmask, resample=resample,
                            y=y, guidance=guidance)
        return mask * x0 + (1.0 - mask) * self.decode(state, z)

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, _ = batch
        imgs = self.preprocess(imgs_raw)
        z = self.encode(state, imgs)
        # first-stage fidelity: what the diffusion ceiling looks like
        recon = self.decode(state, z)
        metrics = {"val/first_stage_recon_mse":
                   jnp.mean((recon - imgs) ** 2)}
        # latent-space forward diffusion endpoint, decoded (the analog of
        # DDPM's 'diffusion' panel)
        n = imgs.shape[0]
        noise_rng, sample_rng = jax.random.split(rng)
        t = jnp.full((n,), self.timesteps - 1, jnp.int32)
        zt = gd.q_sample(self.tables, z, t, jax.random.normal(noise_rng,
                                                              z.shape))
        result = {"real_image": imgs,
                  "others": {"first_stage_recon": recon,
                             "diffusion": self.decode(state, zt)}}
        if sample:
            n_s = int(self.hparams.sample_batch)
            fast = {"ddim": (self.ddim_sample, "ddim_steps"),
                    "dpm": (self.dpm_sample, "dpm_steps")}
            if self.hparams.val_sampler in fast:
                fn, steps_key = fast[self.hparams.val_sampler]
                cond = {}
                if self.num_classes:
                    cond = dict(y=self._default_labels(n_s),
                                guidance=float(self.hparams.guidance_scale))
                result["fake_image"] = fn(
                    state, sample_rng, n_s,
                    steps=int(self.hparams[steps_key]), **cond)
            else:
                result["fake_image"] = self.sample(state, sample_rng, n_s)
        return result, metrics
