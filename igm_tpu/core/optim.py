"""Optimizer construction + partial-update helpers.

The reference's per-model ``configure_optimizers`` (torch Adam/RMSprop with
Step/Lambda LR schedulers) maps to optax transforms here; the K-optimizer
adversarial pattern (SURVEY.md §3.2) maps to named optimizers over disjoint
module-name subsets, updated inside one jitted step via ``grad_step``.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .state import TrainState


# ------------------------------------------------------------------ schedules
def step_lr(base_lr: float, gamma: float, steps_per_epoch: int) -> Callable:
    """torch StepLR(step_size=1 epoch, gamma) parity (`src/models/vae.py:44`)."""
    spe = max(int(steps_per_epoch), 1)

    def schedule(count):
        epoch = count // spe
        return base_lr * (gamma ** epoch)

    return schedule


def halving_lr(base_lr: float, drop_lr_epoch: int, steps_per_epoch: int) -> Callable:
    """torch LambdaLR(0.5 ** (epoch // drop_lr_epoch)) parity (`age.py:53-58`)."""
    spe = max(int(steps_per_epoch), 1)

    def schedule(count):
        epoch = count // spe
        return base_lr * (0.5 ** (epoch // max(int(drop_lr_epoch), 1)))

    return schedule


# ----------------------------------------------------------------- optimizers
def adam(lr, b1: float = 0.9, b2: float = 0.999, mu_dtype: Any = None,
         nu_dtype: Any = None) -> optax.GradientTransformation:
    """``mu_dtype=bfloat16`` halves first-moment HBM traffic — worthwhile
    only for models whose optimizer state dominates the step (MADE's 205M
    output-layer params: +5% step throughput, loss trajectory within
    0.014 bpd of f32 over 100 steps, measured round 2).  Second moments
    stay f32 (squares need the mantissa, not just the exponent).

    ``IGM_MU_DTYPE`` (read at optimizer construction) overrides the
    per-model default for every family — the A/B lever
    benchmarks/bf16_moments_ab.py drives."""
    env = os.environ.get("IGM_MU_DTYPE")
    if env:
        mu_dtype = None if env in ("float32", "f32") else jnp.dtype(env)
    env_nu = os.environ.get("IGM_NU_DTYPE")
    if env_nu:
        nu_dtype = None if env_nu in ("float32", "f32") else jnp.dtype(env_nu)
    if nu_dtype is None:
        return optax.adam(learning_rate=lr, b1=b1, b2=b2, eps=1e-8,
                          mu_dtype=mu_dtype)
    return optax.chain(
        _scale_by_adam_cast(b1, b2, 1e-8, mu_dtype, nu_dtype),
        optax.scale_by_learning_rate(lr))


def _scale_by_adam_cast(b1, b2, eps, mu_dtype, nu_dtype):
    """optax.scale_by_adam with a castable SECOND moment too.

    optax only exposes mu_dtype; for HBM-bound optimizer states (MADE's
    822 MB output layer) casting nu to bf16 halves another read+write pair
    per step.  bf16 keeps f32's exponent range — what squares need — at
    8 bits of mantissa; accept/reject is by measured trajectory
    (benchmarks/bf16_moments_ab.py protocol), recorded in NOTES.md."""
    def cast(x, dt):
        return x.astype(dt) if dt is not None else x

    def init(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32),
                                      mu=mu, nu=nu)

    def update(grads, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        # moment arithmetic in f32 regardless of grad dtype (bf16 wgrads
        # arrive when params are stored bf16 — made.py weight_dtype); only
        # the STORAGE dtype is reduced
        f32 = jnp.float32
        mu = jax.tree_util.tree_map(
            lambda g, m: cast(b1 * m.astype(f32) + (1 - b1) * g.astype(f32),
                              mu_dtype or f32), grads, state.mu)
        nu = jax.tree_util.tree_map(
            lambda g, n: cast(b2 * n.astype(f32)
                              + (1 - b2) * jnp.square(g.astype(f32)),
                              nu_dtype or f32), grads, state.nu)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        updates = jax.tree_util.tree_map(
            lambda m, n: (m.astype(jnp.float32) / bc1)
            / (jnp.sqrt(n.astype(jnp.float32) / bc2) + eps), mu, nu)
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def _hash_noise_u16(shape, seed: jnp.ndarray) -> jnp.ndarray:
    """Per-element 16-bit counter-hash noise (xxhash-style multiply-xor of
    the linear element index with a per-step seed) — the same in-kernel
    trick as ops/pallas_dropout_attention.  Pure fusable elementwise ops:
    unlike ``jax.random.bits`` (an RngBitGenerator HLO whose output
    materialises to HBM — measured: its 822 MB stream erased the ENTIRE
    bf16-weight win on MADE, 65.4 vs 76.6 steps/s), this fuses into the
    consumer and costs no memory traffic."""
    idx = jax.lax.iota(jnp.uint32, int(np.prod(shape))).reshape(shape)
    h = idx * jnp.uint32(0x9E3779B1) ^ seed
    h = (h ^ (h >> 16)) * jnp.uint32(0x85EBCA77)
    h = h ^ (h >> 13)
    return h & jnp.uint32(0xFFFF)


def stochastic_round_bf16(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """f32 -> bf16 with UNBIASED stochastic rounding: add uniform 16-bit
    noise below the bf16 mantissa boundary, truncate.  Carries propagate
    through the IEEE-754 bit pattern correctly (monotone encoding), which
    is exactly round-up on mantissa overflow.

    Round-to-nearest kills bf16 weight training when |update| < ulp(w)/2
    (~0.4% relative): every small step rounds back and the weight
    stagnates.  SR applies each update with probability update/ulp — the
    EXPECTED weight trajectory equals the f32 one."""
    seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max,
                              jnp.int32).astype(jnp.uint32)
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    rounded = (bits + _hash_noise_u16(x.shape, seed)) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded,
                                        jnp.float32).astype(jnp.bfloat16)


def apply_updates_sr(key: jax.Array):
    """``optax.apply_updates`` variant for reduced-precision parameter
    storage: bf16 leaves get the f32 sum stochastically rounded back to
    bf16 (one sub-key per leaf); full-precision leaves are updated exactly
    like optax does.  Returns an ``apply_fn`` for OptimizerSet.grad_step."""
    def apply(params, updates):
        leaves, tdef = jax.tree_util.tree_flatten(params)
        up = jax.tree_util.tree_leaves(updates)
        keys = jax.random.split(key, len(leaves))
        new = []
        for p, u, k in zip(leaves, up, keys):
            if p.dtype == jnp.bfloat16:
                new.append(stochastic_round_bf16(
                    p.astype(jnp.float32) + u.astype(jnp.float32), k))
            else:
                new.append((p + u.astype(p.dtype)).astype(p.dtype))
        return jax.tree_util.tree_unflatten(tdef, new)
    return apply


def rmsprop(lr, alpha: float = 0.99) -> optax.GradientTransformation:
    """torch RMSprop(alpha) parity (`src/models/wgan.py:50-55`)."""
    return optax.rmsprop(learning_rate=lr, decay=alpha, eps=1e-8)


def clip_params(tree: Any, limit: float) -> Any:
    """WGAN 1-Lipschitz weight clipping (`wgan.py:67-68`), functional form."""
    return jax.tree_util.tree_map(lambda p: jnp.clip(p, -limit, limit), tree)


# -------------------------------------------------------------- named updates
class OptimizerSet:
    """Named optimizers over disjoint subsets of TrainState.params."""

    def __init__(self):
        self._opts: Dict[str, Tuple[optax.GradientTransformation, Tuple[str, ...]]] = {}

    def add(self, name: str, tx: optax.GradientTransformation,
            module_names: Iterable[str]) -> "OptimizerSet":
        self._opts[name] = (tx, tuple(module_names))
        return self

    def names(self):
        return list(self._opts)

    def modules_of(self, name: str) -> Tuple[str, ...]:
        return self._opts[name][1]

    def tx(self, name: str) -> optax.GradientTransformation:
        return self._opts[name][0]

    def init(self, params: Dict[str, Any]) -> Dict[str, Any]:
        return {
            name: tx.init({n: params[n] for n in mods})
            for name, (tx, mods) in self._opts.items()
        }

    def grad_step(
        self,
        state: TrainState,
        opt_name: str,
        loss_fn: Callable[[Dict[str, Any]], Tuple[jnp.ndarray, Dict[str, Any]]],
        apply_fn: Callable[[Any, Any], Any] | None = None,
    ) -> Tuple[TrainState, jnp.ndarray, Dict[str, Any]]:
        """One optimizer step on the modules owned by ``opt_name``.

        ``loss_fn(full_params) -> (loss, aux)``; gradients are taken only
        w.r.t. the owned subset (everything else is implicitly
        stop-gradiented — the JAX equivalent of the reference's
        ``.detach()`` / ``backward(inputs=...)`` boundaries).  If ``aux``
        contains ``"mutables"`` the state's mutables are replaced by it.
        ``apply_fn`` overrides ``optax.apply_updates`` (stochastic-rounded
        bf16 parameter storage: ``apply_updates_sr``).
        """
        tx, mods = self._opts[opt_name]
        sub = {n: state.params[n] for n in mods}

        def wrapped(sub_params):
            return loss_fn({**state.params, **sub_params})

        (loss, aux), grads = jax.value_and_grad(wrapped, has_aux=True)(sub)
        updates, new_opt = tx.update(grads, state.opt_states[opt_name], sub)
        new_sub = (apply_fn or optax.apply_updates)(sub, updates)
        state = state.replace(
            params={**state.params, **new_sub},
            opt_states={**state.opt_states, opt_name: new_opt},
        )
        if isinstance(aux, dict) and "mutables" in aux:
            state = state.replace(mutables=aux["mutables"])
        return state, loss, aux

    def apply_grads(self, state: TrainState, opt_name: str,
                    grads: Dict[str, Any]) -> TrainState:
        """Apply externally-computed gradients (VAE-GAN's scaled/summed
        gradient recipe, speed_gan/BiGAN's shared-forward vjp pullbacks)."""
        tx, mods = self._opts[opt_name]
        sub = {n: state.params[n] for n in mods}
        updates, new_opt = tx.update(grads, state.opt_states[opt_name], sub)
        new_sub = optax.apply_updates(sub, updates)
        return state.replace(
            params={**state.params, **new_sub},
            opt_states={**state.opt_states, opt_name: new_opt},
        )


def grouped_adam(lr_by_module: Dict[str, Any], b1: float,
                 b2: float) -> optax.GradientTransformation:
    """One optimizer with per-module-name learning rates (torch param-groups
    parity — InfoGAN's opt_g has lrG for netG and lrQ for netQ,
    `src/models/info_gan.py:57-61`)."""
    transforms = {name: adam(lr, b1, b2) for name, lr in lr_by_module.items()}

    def label_fn(params):
        return {name: jax.tree_util.tree_map(lambda _: name, sub)
                for name, sub in params.items()}

    return optax.multi_transform(transforms, label_fn)
