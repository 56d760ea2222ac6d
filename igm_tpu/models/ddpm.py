"""DDPM (parity: src/models/ddpm.py:294-521) — the flagship model.

Training: t ~ U[0, T), q_sample, epsilon-prediction l1/l2 loss
(`ddpm.py:446-466`).  Sampling: the reference's 1000-iteration Python loop
(`ddpm.py:399-409`) is ONE ``lax.scan`` over reversed timesteps with the
beta tables as scan constants — the whole ancestral chain compiles to a
single device program (SURVEY.md §3.4 TPU rebuild note).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet, adam
from ..core.state import TrainState, bump
from ..networks.dit import DiT
from ..networks.unet import Unet
from ..ops import diffusion as gd
from .base import BaseModel


def build_denoiser(network: str, *, hidden_dim: int, channels: int,
                   dim_mults, dtype, num_classes: int, remat: bool,
                   pallas_gn: bool = False, depth: int = 8, heads: int = 6,
                   patch: int = 2, attention: str = "auto",
                   block_mode: str = "unroll", pipe_mesh=None,
                   pipe_microbatches: int = 1, sp_mesh=None,
                   moe_experts: int = 0, moe_every: int = 2,
                   moe_capacity: float = 1.25, moe_dispatch: str = "auto"):
    """Backbone factory shared by the diffusion-style models.

    ``network="unet"`` is the parity conv UNet
    (`/root/reference/src/models/ddpm.py:170-261`); ``"dit"`` is the
    beyond-parity transformer backbone (networks/dit.py) whose
    GEMM-dominated shape buys MFU headroom on TPU.  ``hidden_dim`` doubles
    as the DiT token width."""
    if network == "unet":
        return Unet(dim=hidden_dim, channels=channels,
                    dim_mults=tuple(dim_mults), dtype=dtype,
                    num_classes=num_classes, remat=remat,
                    pallas_gn=pallas_gn)
    if network == "dit":
        return DiT(dim=hidden_dim, depth=depth, heads=heads, patch=patch,
                   channels=channels, num_classes=num_classes, dtype=dtype,
                   remat=remat, attn=attention, block_mode=block_mode,
                   pipe_mesh=pipe_mesh, pipe_microbatches=pipe_microbatches,
                   sp_mesh=sp_mesh, moe_experts=moe_experts,
                   moe_every=moe_every, moe_capacity=moe_capacity,
                   moe_dispatch=moe_dispatch)
    raise ValueError(f"network must be unet|dit, got {network!r}")


class DDPM(BaseModel):
    def __init__(self, datamodule: Any, hidden_dim: int = 64,
                 timesteps: int = 1000, loss_type: str = "l1",
                 dim_mults: Sequence[int] = (1, 2, 4, 8), lr: float = 2e-4,
                 b1: float = 0.5, b2: float = 0.999, optim: str = "adam",
                 beta_schedule: str = "cosine", sample_batch: int = 64,
                 compute_dtype: str = "auto", remat: bool = False,
                 ema_decay: float = 0.0, val_sampler: str = "ancestral",
                 ddim_steps: int = 50, dpm_steps: int = 20,
                 dpm_schedule: str = "uniform",
                 pallas_gn: str | bool = "auto",
                 num_classes: int | None = 0, cond_drop_prob: float = 0.1,
                 guidance_scale: float = 2.0, network: str = "unet",
                 depth: int = 8, heads: int = 6, patch: int = 2,
                 parameterization: str = "eps", snr_gamma: float = 0.0,
                 attention: str = "auto", block_mode: str = "unroll",
                 pipe_mesh=None, pipe_microbatches: int = 1, sp_mesh=None,
                 moe_experts: int = 0, moe_every: int = 2,
                 moe_capacity: float = 1.25, moe_aux_weight: float = 0.01,
                 moe_dispatch: str = "auto", **kwargs):
        super().__init__(datamodule)
        # beyond-parity training knobs (defaults reproduce the reference's
        # eps-prediction / unweighted loss exactly):
        # - parameterization="v" trains v = sqrt(ac)*eps - sqrt(1-ac)*x0
        #   (Salimans & Ho 2022) — better-conditioned target at high t,
        #   standard for cosine-schedule + fast-sampler pipelines; every
        #   sampler keeps consuming eps via the exact conversion in _eps.
        # - snr_gamma>0 enables Min-SNR-gamma loss weighting (Hang et al.
        #   2023, gamma=5 typical): caps the per-timestep SNR weight so
        #   low-noise steps stop dominating the gradient.
        if parameterization not in ("eps", "v"):
            raise ValueError(f"parameterization must be eps|v, "
                             f"got {parameterization!r}")
        # class-conditional DDPM + classifier-free guidance (beyond parity;
        # the reference DDPM is unconditional).  num_classes=0 keeps the
        # exact unconditional param tree / behavior.
        self.num_classes = int(num_classes or 0)
        self.save_hyperparameters(hidden_dim=hidden_dim, timesteps=timesteps,
                                  loss_type=loss_type,
                                  dim_mults=list(dim_mults), lr=lr, b1=b1,
                                  b2=b2, beta_schedule=beta_schedule,
                                  sample_batch=sample_batch,
                                  ema_decay=ema_decay,
                                  val_sampler=val_sampler,
                                  ddim_steps=ddim_steps, dpm_steps=dpm_steps,
                                  dpm_schedule=dpm_schedule,
                                  num_classes=self.num_classes,
                                  cond_drop_prob=cond_drop_prob,
                                  guidance_scale=guidance_scale,
                                  network=network, depth=depth, heads=heads,
                                  patch=patch,
                                  parameterization=parameterization,
                                  snr_gamma=snr_gamma, attention=attention,
                                  block_mode=block_mode,
                                  pipe_microbatches=pipe_microbatches,
                                  moe_experts=int(moe_experts),
                                  moe_aux_weight=float(moe_aux_weight))
        self.timesteps = int(timesteps)
        self.tables = gd.make_tables(self.timesteps, beta_schedule)
        # bfloat16 convs on TPU (MXU fast path; params + loss stay f32);
        # float32 elsewhere.  Override with compute_dtype: float32|bfloat16.
        if compute_dtype == "auto":
            compute_dtype = ("bfloat16" if jax.default_backend() == "tpu"
                             else "float32")
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else None
        # fused GroupNorm+Mish Pallas kernel: measured ~1.5x SLOWER than
        # XLA's own fusion at DDPM shapes (NOTES.md) so default off;
        # config knob with one-time env fallback (NOT read at trace time).
        if pallas_gn == "auto":
            import os
            pallas_gn = os.environ.get("IGM_PALLAS_GN", "0") == "1"
        self.modules = ModuleDict(
            denoise=build_denoiser(network, hidden_dim=hidden_dim,
                                   channels=self.denoise_channels,
                                   dim_mults=dim_mults, dtype=dtype,
                                   num_classes=self.num_classes,
                                   remat=bool(remat),
                                   pallas_gn=bool(pallas_gn), depth=depth,
                                   heads=heads, patch=patch,
                                   attention=attention,
                                   block_mode=block_mode,
                                   pipe_mesh=pipe_mesh,
                                   pipe_microbatches=pipe_microbatches,
                                   sp_mesh=sp_mesh,
                                   moe_experts=int(moe_experts),
                                   moe_every=int(moe_every),
                                   moe_capacity=float(moe_capacity),
                                   moe_dispatch=str(moe_dispatch)))

    def enable_sequence_parallel(self, mesh) -> None:
        """Rebuild the denoiser with the Megatron-SP token-axis constraint
        (networks/dit.py ``sp_mesh``).  Composes with mode="tensor" state
        sharding on the same (data, model) mesh — TP splits the GEMMs, SP
        shards the between-GEMM activations over tokens.  Trainer
        mesh.sequence=true calls this."""
        if self.hparams.get("network") != "dit":
            raise ValueError("sequence parallelism needs network=dit "
                             f"(got {self.hparams.get('network')!r})")
        den = self.modules["denoise"]
        self.modules.modules["denoise"] = den.clone(sp_mesh=mesh)

    def enable_pipeline(self, mesh, microbatches: int = 1) -> None:
        """Rebuild the denoiser for GPipe pipeline parallelism
        (parallel/pipeline.py): stacked block layout, stage-sharded apply.
        Call BEFORE init_state — the param tree switches to the stacked
        ``blocks`` layout.  Trainer mesh.mode="pipeline" calls this."""
        if self.hparams.get("network") != "dit":
            raise ValueError("pipeline parallelism needs network=dit "
                             f"(got {self.hparams.get('network')!r})")
        den = self.modules["denoise"]
        self.modules.modules["denoise"] = den.clone(
            block_mode="scan", pipe_mesh=mesh,
            pipe_microbatches=int(microbatches))

    # hooks overridden by LatentDDPM (diffusion in a learned latent space)
    @property
    def denoise_channels(self) -> int:
        return self.channels

    def _sample_shape(self, n: int) -> tuple:
        return (n, self.height, self.width, self.channels)

    def _to_diffusion_space(self, state, imgs: jnp.ndarray) -> jnp.ndarray:
        return imgs

    def init_state(self, rng: jax.Array) -> TrainState:
        hp = self.hparams
        self.optimizers = OptimizerSet().add(
            "opt", adam(hp.lr, hp.b1, hp.b2), ["denoise"])
        dummy = (self.dummy_image_batch(1), jnp.zeros((1,)))
        if self.num_classes:
            dummy = dummy + (jnp.zeros((1,), jnp.int32),)
        state = self.make_state(rng, {"denoise": dummy})
        if hp.ema_decay > 0:
            # EMA shadow of the denoiser (beyond-parity quality lever;
            # standard DDPM practice, absent in the reference) — carried in
            # opt_states so checkpoints/resume include it.
            state = state.replace(opt_states={
                **state.opt_states, "ema": state.params["denoise"]})
        return state

    # ------------------------------------------------------------------ train
    def train_step(self, state: TrainState, batch):
        imgs_raw, labels = batch
        # unconditional keeps the exact 2-key split (pre-round-3 RNG-stream
        # compatibility); conditional draws a third key for label dropout
        n_keys = 3 if self.num_classes else 2
        state, rngs = state.next_rng(n_keys)
        t_rng, noise_rng = rngs[0], rngs[1]
        imgs = self._to_diffusion_space(state, self.preprocess(imgs_raw))
        n = imgs.shape[0]
        t = jax.random.randint(t_rng, (n,), 0, self.timesteps)
        noise = jax.random.normal(noise_rng, imgs.shape)
        x_noisy = gd.q_sample(self.tables, imgs, t, noise)
        if self.num_classes:
            # classifier-free guidance training: drop the label to the null
            # token with prob cond_drop_prob so one network learns both the
            # conditional and unconditional score (Ho & Salimans 2022)
            drop = jax.random.bernoulli(
                rngs[2], float(self.hparams.cond_drop_prob), (n,))
            y = (jnp.where(drop, self.num_classes,
                           labels.astype(jnp.int32)),)
        else:
            y = ()

        if self.hparams.parameterization == "v":
            target = gd.v_target(self.tables, imgs, t, noise)
        else:
            target = noise
        # min-SNR-gamma weight; ones (a broadcast no-op XLA folds away)
        # when snr_gamma <= 0, so the default loss is bit-identical to the
        # unweighted reference form
        w = gd.loss_weight(self.tables, t, imgs.ndim,
                           str(self.hparams.parameterization),
                           float(self.hparams.snr_gamma))

        def loss_fn(params):
            pred, mut = self.modules.apply("denoise", params, state.mutables,
                                           x_noisy, t, *y)
            if self.hparams.loss_type == "l1":
                loss = (w * jnp.abs(target - pred)).mean()
            elif self.hparams.loss_type == "l2":
                loss = (w * (target - pred) ** 2).mean()
            else:
                raise NotImplementedError(self.hparams.loss_type)
            metrics = {"train_loss/loss": loss}
            if self.hparams.get("moe_experts", 0) and "moe" in mut:
                # Switch load-balance loss, mean over the MoE blocks
                # (networks/moe.py; sowed per block into the "moe"
                # collection with a replace-reduce).  Scalar "aux" leaves
                # are the loss; vector "load" leaves are the per-expert
                # routed fractions — aggregated here into router-health
                # metrics (collapse = entropy -> 0 / min share -> 0).
                leaves = jax.tree_util.tree_leaves(mut["moe"])
                auxes = [v for v in leaves if v.ndim == 0]
                loads = [v for v in leaves if v.ndim == 1]
                aux = sum(auxes) / max(1, len(auxes))
                loss = loss + float(self.hparams.moe_aux_weight) * aux
                metrics["train_loss/moe_aux"] = aux
                metrics["train_loss/loss"] = loss
                if loads:
                    load = sum(loads) / len(loads)       # [E] mean fraction
                    e = load.shape[0]
                    ent = -jnp.sum(load * jnp.log(load + 1e-9))
                    metrics["moe/load_entropy"] = ent / jnp.log(float(e))
                    metrics["moe/min_share"] = jnp.min(load) * e
            return loss, {"metrics": metrics,
                          "mutables": {**state.mutables, "denoise": mut}}

        state, _, aux = self.optimizers.grad_step(state, "opt", loss_fn)
        if self.hparams.ema_decay > 0:
            d = self.hparams.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p,
                state.opt_states["ema"], state.params["denoise"])
            state = state.replace(opt_states={**state.opt_states, "ema": ema})
        return bump(state), aux["metrics"]

    # --------------------------------------------------------------- sampling
    def _denoise(self, state, x, t, y=None):
        params = state.params
        if self.hparams.ema_decay > 0 and "ema" in state.opt_states:
            params = {**params, "denoise": state.opt_states["ema"]}
        if self.num_classes and y is None:
            # unconditional generation from a conditional model = the
            # trained null token
            y = jnp.full((x.shape[0],), self.num_classes, jnp.int32)
        args = (x, t) if y is None else (x, t, y)
        out, _ = self.modules.apply("denoise", params, state.mutables,
                                    *args, train=False)
        return out

    def _eps(self, state, x, t, y=None, guidance: float = 1.0):
        """Noise prediction with optional classifier-free guidance:
        ``eps = eps_null + s * (eps_y - eps_null)`` — s=1 is the plain
        conditional prediction (one forward), s=0 unconditional.  The two
        CFG branches run as ONE doubled batch (a single MXU-friendly
        dispatch inside the sampling scan, not two half-size ones).

        A v-predicting network (parameterization="v") is adapted HERE, the
        single choke point every sampler goes through: eps = sqrt(1-ac)*x
        + sqrt(ac)*v (exact; linear, so CFG combines identically in either
        space)."""
        if self.num_classes == 0 or y is None or guidance == 1.0:
            out = self._denoise(state, x, t, y)
        else:
            null = jnp.full_like(y, self.num_classes)
            out2 = self._denoise(state, jnp.concatenate([x, x]),
                                 jnp.concatenate([t, t]),
                                 jnp.concatenate([y, null]))
            out_y, out_null = jnp.split(out2, 2)
            out = out_null + guidance * (out_y - out_null)
        if self.hparams.parameterization == "v":
            # t arrives as exact integers in f32 (network convention)
            out = gd.eps_from_v(self.tables, x, t.astype(jnp.int32), out)
        return out

    @property
    def x0_bound(self) -> float:
        """Clamp for implied-x0 predictions inside the samplers.  1.0 is
        the pixel-space data range (images are normalized to [-1, 1],
        the reference's clip_denoised, ddpm.py:390-397).  Subclasses whose
        diffusion space is NOT bounded override this: LatentDDPM returns
        0.0 (= no clipping) because its calibrated unit-variance latents
        routinely exceed +-1 — clipping them was measured to collapse the
        latent gallery to gray noise (round 5b, NOTES.md)."""
        return 1.0

    def _clip_x0(self, x0: jnp.ndarray) -> jnp.ndarray:
        b = self.x0_bound
        return jnp.clip(x0, -b, b) if b > 0 else x0

    def p_sample(self, state, x, t, rng, clip_denoised: bool = True,
                 y=None, guidance: float = 1.0):
        """One reverse step p(x_{t-1} | x_t); t is a (N,) int32 batch
        (ddpm.py:378-397)."""
        eps = self._eps(state, x, t.astype(jnp.float32), y, guidance)
        x_recon = gd.predict_start_from_noise(self.tables, x, t, eps)
        if clip_denoised:
            x_recon = self._clip_x0(x_recon)
        mean, _var, log_var = gd.q_posterior(self.tables, x_recon, x, t)
        noise = jax.random.normal(rng, x.shape)
        nonzero = (t > 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise

    def p_sample_loop(self, state, rng, shape, t_start: int | None = None,
                      init_x: jnp.ndarray | None = None,
                      y=None, guidance: float = 1.0) -> jnp.ndarray:
        """Full ancestral chain as one lax.scan (ddpm.py:399-409)."""
        t_start = self.timesteps if t_start is None else t_start
        init_rng, chain_rng = jax.random.split(rng)
        x = (jax.random.normal(init_rng, shape) if init_x is None else init_x)

        def step(carry, t):
            x, key = carry
            key, sub = jax.random.split(key)
            tb = jnp.full((shape[0],), t, jnp.int32)
            x = self.p_sample(state, x, tb, sub, y=y, guidance=guidance)
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, chain_rng),
                                 jnp.arange(t_start - 1, -1, -1))
        return x

    def _default_labels(self, n: int) -> jnp.ndarray:
        """Contiguous class blocks — with n a multiple of the grid row the
        sample grid shows one class per row (cvae.py sample convention)."""
        return (jnp.arange(n) * self.num_classes // n).astype(jnp.int32)

    def sample(self, state: TrainState, rng: jax.Array, n: int,
               y=None) -> jnp.ndarray:
        guidance = 1.0
        if self.num_classes:
            if y is None:
                y = self._default_labels(n)
            guidance = float(self.hparams.guidance_scale)
        return self.p_sample_loop(
            state, rng, self._sample_shape(n), y=y, guidance=guidance)

    def ddim_sample(self, state: TrainState, rng: jax.Array, n: int,
                    steps: int = 50, eta: float = 0.0,
                    y=None, guidance: float = 1.0,
                    clip_denoised: bool = True) -> jnp.ndarray:
        """DDIM sampler (Song et al. 2021) over an evenly-spaced timestep
        subsequence — beyond-parity fast inference (steps ~50 vs the
        ancestral chain's 1000).  eta=0 gives the deterministic ODE sampler.

        When ``clip_denoised`` bounds the implied x0 to the data range,
        eps is RE-DERIVED from the clipped x0 so the (x0, eps) pair stays
        consistent — using the stale pre-clip eps for the direction term
        walks off the clipped manifold every step and was measured to
        collapse sample quality on short-trained models (round-4 anomaly:
        DDIM-50 digit-IS 2.53 vs DPM-20's 5.46 on the same ddpm_cifar
        weights; DPM-Solver++ is data-prediction so its clip is consistent
        by construction — this re-derivation gives DDIM the same
        property).  Root-cause sweep: benchmarks/ddim_sweep_round5.*.
        """
        shape = self._sample_shape(n)
        init_rng, chain_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, shape)
        seq = jnp.linspace(0, self.timesteps - 1, steps).round().astype(jnp.int32)
        seq_prev = jnp.concatenate([jnp.array([-1], jnp.int32), seq[:-1]])
        tbl = self.tables

        def step(carry, ts):
            x, key = carry
            t, t_prev = ts
            key, sub = jax.random.split(key)
            tb = jnp.full((n,), t, jnp.int32)
            eps = self._eps(state, x, tb.astype(jnp.float32), y, guidance)
            a_t = tbl.alphas_cumprod[t]
            a_prev = jnp.where(t_prev >= 0, tbl.alphas_cumprod[t_prev], 1.0)
            x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            if clip_denoised and self.x0_bound > 0:
                x0 = self._clip_x0(x0)
                eps = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
            sigma = (eta * jnp.sqrt((1 - a_prev) / (1 - a_t))
                     * jnp.sqrt(1 - a_t / a_prev))
            dir_xt = jnp.sqrt(jnp.maximum(1 - a_prev - sigma ** 2, 0.0)) * eps
            noise = jax.random.normal(sub, shape)
            x = (jnp.sqrt(a_prev) * x0 + dir_xt
                 + jnp.where(t_prev >= 0, sigma, 0.0) * noise)
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, chain_rng),
                                 (seq[::-1], seq_prev[::-1]))
        return x

    def _dpm_timesteps(self, steps: int, schedule: str,
                       rho: float = 7.0) -> "np.ndarray":
        """Static (trace-time) timestep subsequence for dpm_sample, as an
        ascending int array.  ``uniform`` is even spacing in t;
        ``logsnr`` is even spacing in half-log-SNR (lambda) — the spacing
        the DPM-Solver paper recommends (Lu et al. 2022 §3.2); ``karras``
        spaces sigma^(1/rho) evenly (Karras et al. 2022 §5) with sigma_max
        clamped to 80 (the k-diffusion convention — the cosine table's own
        sigma_max is ~1300, which would dump the whole budget into the
        first prior-sampling region; at sigma 80 alpha is 1.6e-4 so
        starting from N(0, I) there is exact to ~1e-2).  Targets map to
        the nearest discrete t; duplicates (tiny step counts) are deduped,
        so the returned length can be < steps."""
        import numpy as np
        if schedule == "uniform":
            return np.linspace(0, self.timesteps - 1,
                               steps).round().astype(np.int32)
        acp = np.asarray(self.tables.alphas_cumprod, np.float64)
        sig = np.sqrt((1.0 - acp) / acp)  # VP sigma(t), ascending in t
        if schedule == "logsnr":
            lam = 0.5 * np.log(acp / (1.0 - acp))
            targets = np.linspace(lam[-1], lam[0], steps)
            t = np.abs(lam[None, :] - targets[:, None]).argmin(axis=1)
        elif schedule == "karras":
            smin, smax = sig[0], min(float(sig[-1]), 80.0)
            frac = np.linspace(0.0, 1.0, steps)
            sk = (smax ** (1 / rho)
                  + frac * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
            t = np.abs(sig[None, :] - sk[:, None]).argmin(axis=1)
        else:
            raise ValueError(f"dpm schedule must be uniform|logsnr|karras, "
                             f"got {schedule!r}")
        return np.unique(t).astype(np.int32)

    def dpm_sample(self, state: TrainState, rng: jax.Array, n: int,
                   steps: int = 20, y=None, guidance: float = 1.0,
                   schedule: str | None = None) -> jnp.ndarray:
        """DPM-Solver++(2M) (Lu et al. 2022) — deterministic second-order
        multistep ODE sampler in half-log-SNR (lambda) space, beyond-parity
        fast inference: comparable sample quality to DDIM-50 in ~20 model
        evaluations.  Data-prediction form; one ``lax.scan`` whose carry
        holds the previous step's x0 prediction and lambda gap (the
        multistep history), so the whole chain is a single device program
        like the other samplers."""
        shape = self._sample_shape(n)
        # same split convention as ddim_sample: a deterministic sampler only
        # consumes the init key, so ddim(eta=0) and dpm start from the SAME
        # noise for a given rng (the agreement test relies on this)
        init_rng, _ = jax.random.split(rng)
        x = jax.random.normal(init_rng, shape)
        if schedule is None:
            schedule = str(self.hparams.dpm_schedule)
        seq = jnp.asarray(self._dpm_timesteps(steps, schedule))
        t_cur = seq[::-1]
        t_next = jnp.concatenate([jnp.array([-1], jnp.int32), seq[:-1]])[::-1]
        acp = self.tables.alphas_cumprod

        def lam(a):
            return 0.5 * (jnp.log(a) - jnp.log1p(-a))

        def step(carry, ts):
            x, x0_prev, h_prev = carry
            t, tn = ts
            a_cur = acp[t]
            sigma_cur = jnp.sqrt(1.0 - a_cur)
            lam_cur = lam(a_cur)
            final = tn < 0  # virtual t=-1 endpoint: alpha=1, sigma=0
            a_next = acp[jnp.maximum(tn, 0)]
            alpha_n = jnp.where(final, 1.0, jnp.sqrt(a_next))
            sigma_n = jnp.where(final, 0.0, jnp.sqrt(1.0 - a_next))
            # h=30 makes expm1(-h) == -1 to f32 precision (the exact
            # sigma->0 limit, where the update returns D itself)
            lam_n = jnp.where(final, lam_cur + 30.0, lam(a_next))

            tb = jnp.full((shape[0],), t, jnp.int32)
            eps = self._eps(state, x, tb.astype(jnp.float32), y, guidance)
            x0 = gd.predict_start_from_noise(self.tables, x, tb, eps)
            x0 = self._clip_x0(x0)

            h = lam_n - lam_cur
            # first step has no multistep history; the FINAL (sigma->0)
            # step must also drop to first order — its virtual h is not a
            # real lambda gap, and the 2M correction would divide by it
            # (the standard "lower_order_final" rule)
            first_order = (h_prev == 0.0) | final
            r = h_prev / jnp.where(h == 0.0, 1.0, h)
            d2 = x0 + (x0 - x0_prev) / jnp.maximum(2.0 * r, 1e-12)
            d = jnp.where(first_order, x0, d2)
            x = (sigma_n / sigma_cur) * x - alpha_n * jnp.expm1(-h) * d
            return (x, x0, h), None

        (x, _, _), _ = jax.lax.scan(
            step, (x, jnp.zeros(shape), jnp.asarray(0.0)), (t_cur, t_next))
        return x

    def interpolate(self, state, rng, x1, x2, t: int | None = None,
                    weight: float = 0.5) -> jnp.ndarray:
        """(ddpm.py:417-431) diffuse both to t, lerp, denoise back."""
        t = self.timesteps - 1 if t is None else t
        n = x1.shape[0]
        r1, r2, r3 = jax.random.split(rng, 3)
        tb = jnp.full((n,), t, jnp.int32)
        xt1 = gd.q_sample(self.tables, x1, tb, jax.random.normal(r1, x1.shape))
        xt2 = gd.q_sample(self.tables, x2, tb, jax.random.normal(r2, x2.shape))
        img = (1.0 - weight) * xt1 + weight * xt2
        return self.p_sample_loop(state, r3, x1.shape, t_start=t, init_x=img)

    def inpaint(self, state, rng, x0, mask, resample: int = 1,
                y=None, guidance: float = 1.0) -> jnp.ndarray:
        """RePaint-style inpainting (Lugmayr et al. 2022, Alg. 1): ancestral
        sampling where at every reverse step the known region is replaced by
        the forward-diffused original, so the hole is generated conditioned
        on its surroundings.  ``mask`` broadcasts to ``x0`` with 1 = known
        pixel (kept), 0 = hole (generated); ``x0`` is in model space [-1,1].
        ``resample=U`` re-diffuses each step U times (RePaint's boundary
        harmonization); U=1 is plain masked conditioning.  Whole chain is
        one ``lax.scan`` with a static inner ``fori_loop`` — a single device
        program like the other samplers.  Beyond parity: the reference's
        closest capabilities are DDPM interpolate
        (`/root/reference/src/models/ddpm.py:417-431`) and TAR completion
        (`tar.py` top-half inpainting); it has no diffusion inpainting."""
        mask = jnp.broadcast_to(mask, x0.shape).astype(x0.dtype)
        tbl = self.tables
        init_rng, chain_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, x0.shape)
        u_total = max(int(resample), 1)

        def reverse_masked(x, t, key):
            k_rev, k_known = jax.random.split(key)
            tb = jnp.full((x0.shape[0],), t, jnp.int32)
            x_un = self.p_sample(state, x, tb, k_rev, y=y, guidance=guidance)
            # known side diffused to the level p_sample just produced (t-1);
            # at t == 0 that level is the clean image itself
            tm1 = jnp.full_like(tb, jnp.maximum(t - 1, 0))
            x_kn = jnp.where(
                t > 0,
                gd.q_sample(tbl, x0, tm1, jax.random.normal(k_known, x0.shape)),
                x0)
            return mask * x_kn + (1.0 - mask) * x_un

        def step(carry, t):
            def body(u, xk):
                x, key = xk
                key, k_step, k_fwd = jax.random.split(key, 3)
                x = reverse_masked(x, t, k_step)
                # RePaint resampling: re-diffuse x_{t-1} -> x_t one step
                # (q(x_t | x_{t-1}), beta_t) for the next harmonization
                # pass; skipped on the final pass and at t == 0
                redo = (u < u_total - 1) & (t > 0)
                fwd = (jnp.sqrt(1.0 - tbl.betas[t]) * x
                       + jnp.sqrt(tbl.betas[t])
                       * jax.random.normal(k_fwd, x.shape))
                return (jnp.where(redo, fwd, x), key)

            return jax.lax.fori_loop(0, u_total, body, carry), None

        (x, _), _ = jax.lax.scan(step, (x, chain_rng),
                                 jnp.arange(self.timesteps - 1, -1, -1))
        # exact composite: known pixels come back bit-identical
        return mask * x0 + (1.0 - mask) * x

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):
        imgs_raw, _ = batch
        imgs = self.preprocess(imgs_raw)
        n = imgs.shape[0]
        noise_rng, sample_rng = jax.random.split(rng)
        t = jnp.full((n,), self.timesteps - 1, jnp.int32)
        diffusion_imgs = gd.q_sample(self.tables, imgs, t,
                                     jax.random.normal(noise_rng, imgs.shape))
        result = {"real_image": imgs, "others": {"diffusion": diffusion_imgs}}
        if sample:
            n_s = int(self.hparams.sample_batch)
            fast = {"ddim": (self.ddim_sample, "ddim_steps"),
                    "dpm": (self.dpm_sample, "dpm_steps")}
            if self.hparams.val_sampler in fast:
                # beyond-parity: 20-50x cheaper validation sampling
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
        return result, {}
