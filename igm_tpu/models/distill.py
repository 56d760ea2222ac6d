"""Progressive distillation (Salimans & Ho, ICLR 2022) — beyond parity.

Halves a trained DDPM/DDIM teacher's sampling step count per phase: a
student (initialised FROM the teacher) learns to match TWO deterministic
DDIM teacher steps with ONE of its own, so ``K`` phases turn a 1000-step
sampler into a 1000/2^K-step one at near-teacher quality.  This completes
the framework's fast-sampler ladder between the training-free solvers
(DDIM/DPM-Solver++ over the reference's ancestral chain,
`/root/reference/src/models/ddpm.py:399-409`) and consistency models'
1-2-step generation: distillation trades a short finetune for step counts
the solvers can't reach.

TPU-first shape:

- ONE jitted train step holds both networks: the frozen teacher's params
  ride in ``opt_states["teacher"]`` (the same no-optimizer-owns-it slot
  the EMA copy uses), the student in ``params["denoise"]`` — teacher
  forwards are ``stop_gradient``-free by construction (grads only flow
  through the student's apply);
- the two teacher DDIM half-steps + target algebra are closed-form table
  lookups fused into the same XLA program as the student forward/backward
  — no sampling loop, no host sync;
- the phase time grid (paper's ``t = i/N`` ladder mapped onto the
  discrete ``alphas_cumprod`` table) is a trace-time numpy constant.

One run = one halving phase (the paper retrains per phase):
``model.teacher_ckpt=<orbax dir>`` + ``model.student_steps=N`` distills a
2N-step teacher into an N-step student; chain runs to keep halving, then
sample with ``ddim_sample(steps=N)`` (the model IS a DDPM — every
sampler, export path, and callback keeps working).

Loss: truncated-SNR weighting ``max(alpha^2/sigma^2, 1)`` on the
x0-space regression against the implied one-step target (paper eq. 9 and
App. E) — tested against a hand-rolled two-step DDIM composition in
tests/test_distill.py.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import TrainState, bump
from ..ops import diffusion as gd
from .ddpm import DDPM


class ProgressiveDistillation(DDPM):
    def __init__(self, datamodule: Any, student_steps: int = 8,
                 teacher_ckpt: str | None = None, **kwargs):
        kwargs.setdefault("loss_type", "l2")
        # v-prediction by default: the paper's key finding (§4) is that
        # eps-prediction is unusable for few-step students — the implied
        # x0 = (x - sigma*eps)/alpha amplifies eps error by 1/alpha (~300x
        # at the cosine tail), while x0 = alpha*x - sigma*v is bounded
        # (measured here: eps-param toy loss ~4e5 vs v-param ~1e0)
        kwargs.setdefault("parameterization", "v")
        super().__init__(datamodule, **kwargs)
        if self.num_classes:
            raise ValueError("progressive distillation is unconditional "
                             "(CFG-aware distillation not implemented)")
        if student_steps < 1 or 2 * student_steps > self.timesteps:
            raise ValueError(
                f"student_steps must be in [1, timesteps/2], got "
                f"{student_steps} (timesteps={self.timesteps})")
        self.hparams["student_steps"] = int(student_steps)
        self.hparams["teacher_ckpt"] = str(teacher_ckpt or "")
        # default fast sampler = the student's own step count
        self.hparams["ddim_steps"] = int(student_steps)

    # ------------------------------------------------------------------ state
    def init_state(self, rng: jax.Array) -> TrainState:
        state = super().init_state(rng)
        ckpt = self.hparams["teacher_ckpt"]
        if ckpt:
            from ..core.checkpoint import CheckpointManager
            raw = CheckpointManager(ckpt).restore_raw()
            if "denoise" not in raw.get("params", {}):
                raise ValueError(f"teacher_ckpt {ckpt} has no 'denoise' "
                                 "params - not a ddpm-family checkpoint?")
            have = jax.tree_util.tree_map(jnp.shape,
                                          state.params["denoise"])
            got = jax.tree_util.tree_map(jnp.shape,
                                         raw["params"]["denoise"])
            if have != got:
                raise ValueError(
                    f"teacher denoiser shape mismatch (config vs ckpt):\n"
                    f"  config    {have}\n  checkpoint {got}")
            # prefer the teacher's EMA weights when the ckpt carries them
            teacher = raw.get("opt_states", {}).get(
                "ema", raw["params"]["denoise"])
            mut = dict(state.mutables)
            if "denoise" in raw.get("mutables", {}):
                mut["denoise"] = raw["mutables"]["denoise"]
            # student initialised FROM the teacher (paper §3)
            state = state.replace(
                params={**state.params, "denoise": teacher}, mutables=mut)
        else:
            teacher = state.params["denoise"]
        state = state.replace(opt_states={
            **state.opt_states, "teacher": teacher})
        return state

    # ----------------------------------------------------------- phase ladder
    def _phase_grid(self) -> np.ndarray:
        """Ascending 2N+1-point timestep ladder on the teacher's discrete
        table: even entries are the student's N+1 times, odd entries the
        teacher's midpoints."""
        big_n = int(self.hparams["student_steps"])
        return np.linspace(0, self.timesteps - 1,
                           2 * big_n + 1).round().astype(np.int32)

    def _teacher_eps(self, state: TrainState, x, t):
        """Frozen-teacher eps prediction (v converted exactly, as _eps)."""
        out, _ = self.modules.apply(
            "denoise", {"denoise": state.opt_states["teacher"]},
            state.mutables, x, t.astype(jnp.float32), train=False)
        if self.hparams.parameterization == "v":
            out = gd.eps_from_v(self.tables, x, t, out)
        return out

    @staticmethod
    def _ddim_det(tables, x, eps, t, t_prev, clip: bool = True):
        """One deterministic (eta=0) DDIM step t -> t_prev; t_prev may be
        0 (a_prev from the table, NOT the ddim_sample boundary convention
        — the grid never steps past index 0).  clip bounds the implied x0
        to the data range (ddim_sample's clip_denoised convention) — for
        the TEACHER composition this is essential: at high t the 1/alpha_t
        amplification (~30x at the cosine tail) otherwise turns early-
        training eps error into exploding distillation targets (measured:
        unclipped targets sent the toy loss 0.25 -> 4e4)."""
        a_t = gd.extract(tables.alphas_cumprod, t, x.ndim)
        a_p = gd.extract(tables.alphas_cumprod, t_prev, x.ndim)
        x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        if clip:
            x0 = jnp.clip(x0, -1.0, 1.0)
            eps = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t)
        return jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * eps

    def _distill_target(self, state: TrainState, x_t, t, tm, tp):
        """Two teacher DDIM half-steps t -> tm -> tp, then the implied
        one-step clean-image target (paper eq. 9):
        ``x~ = (z'' - (sig''/sig_t) x_t) / (alf'' - (sig''/sig_t) alf_t)``.
        """
        tbl = self.tables
        z1 = self._ddim_det(tbl, x_t, self._teacher_eps(state, x_t, t),
                            t, tm)
        z2 = self._ddim_det(tbl, z1, self._teacher_eps(state, z1, tm),
                            tm, tp)
        a_t = gd.extract(tbl.alphas_cumprod, t, x_t.ndim)
        a_p = gd.extract(tbl.alphas_cumprod, tp, x_t.ndim)
        alf_t, sig_t = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
        alf_p, sig_p = jnp.sqrt(a_p), jnp.sqrt(1.0 - a_p)
        ratio = sig_p / sig_t
        return (z2 - ratio * x_t) / (alf_p - ratio * alf_t)

    # ------------------------------------------------------------------ train
    def train_step(self, state: TrainState, batch):
        imgs_raw, _ = batch
        state, rngs = state.next_rng(2)
        i_rng, noise_rng = rngs[0], rngs[1]
        imgs = self._to_diffusion_space(state, self.preprocess(imgs_raw))
        n = imgs.shape[0]
        grid = jnp.asarray(self._phase_grid())
        big_n = int(self.hparams["student_steps"])

        # per-sample student time: even grid index 2i, i ~ U{1..N}
        i = jax.random.randint(i_rng, (n,), 1, big_n + 1)
        t, tm, tp = grid[2 * i], grid[2 * i - 1], grid[2 * i - 2]
        noise = jax.random.normal(noise_rng, imgs.shape)
        x_t = gd.q_sample(self.tables, imgs, t, noise)

        target = jax.lax.stop_gradient(
            self._distill_target(state, x_t, t, tm, tp))
        a_t = gd.extract(self.tables.alphas_cumprod, t, imgs.ndim)
        # truncated SNR weight max(alpha^2/sigma^2, 1) in x0 space
        w = jnp.maximum(a_t / (1.0 - a_t), 1.0)

        def loss_fn(params):
            pred, mut = self.modules.apply("denoise", params, state.mutables,
                                           x_t, t.astype(jnp.float32))
            if self.hparams.parameterization == "v":
                # direct, bounded form (NOT via eps: the (x - sigma*eps)/
                # alpha round-trip divides by alpha ~ 3e-3 at the tail)
                x0_hat = (jnp.sqrt(a_t) * x_t
                          - jnp.sqrt(1.0 - a_t) * pred)
            else:
                x0_hat = (x_t - jnp.sqrt(1.0 - a_t) * pred) / jnp.sqrt(a_t)
            loss = (w * (target - x0_hat) ** 2).mean()
            return loss, {"metrics": {"train_loss/loss": loss},
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
    def student_sample(self, state: TrainState, rng: jax.Array,
                       n: int) -> jnp.ndarray:
        """N deterministic (unclipped) DDIM steps on the EXACT times the
        student was distilled for — the phase grid's even entries — so
        inference matches the training-time one-step composition (the
        inherited ddim_sample's linspace(0,T-1,N) grid and x0 clipping
        would evaluate the student off its trained ladder)."""
        grid = self._phase_grid()
        seq = jnp.asarray(grid[::2][::-1].copy())  # T-1 ... -> 0, N+1 times
        shape = self._sample_shape(n)
        x = jax.random.normal(rng, shape)

        def step(x, ts):
            t_cur, t_next = ts
            tb = jnp.full((n,), t_cur, jnp.int32)
            eps = self._eps(state, x, tb.astype(jnp.float32))
            return self._ddim_det(self.tables, x, eps, tb,
                                  jnp.full((n,), t_next, jnp.int32)), None

        x, _ = jax.lax.scan(step, x, (seq[:-1], seq[1:]))
        return x

    def sample(self, state: TrainState, rng: jax.Array, n: int,
               y=None) -> jnp.ndarray:
        return jnp.clip(self.student_sample(state, rng, n), -1.0, 1.0)
