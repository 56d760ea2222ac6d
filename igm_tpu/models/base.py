"""BaseModel + ValidationResult — the model <-> trainer/callbacks contract.

Parity: `/root/reference/src/models/base.py:7-31`.  The ValidationResult
dataclass is the single most load-bearing interface (SURVEY.md §3.3): every
callback consumes it.

Model interface consumed by the Trainer (all pure, jit-compiled once):
  init_state(rng)                          -> TrainState
  train_step(state, batch)                 -> (TrainState, metrics dict)
  validation_step(state, batch, rng,
                  sample: bool [static])   -> (ValidationResult, metrics dict)
and for callbacks:
  forward(state, z)    decode latents to images (model output range)
  sample(state, rng, n)

Batches are (uint8/float images NHWC, int labels); ``preprocess`` performs
the device-side uint8->float normalisation (BASELINE.json mandate) inside
the jitted step.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config.node import ConfigNode
from ..core.modules import ModuleDict
from ..core.optim import OptimizerSet
from ..core.state import TrainState


@dataclasses.dataclass
class ValidationResult:
    others: Dict[str, Any] = dataclasses.field(default_factory=dict)
    real_image: Any = None
    fake_image: Any = None
    recon_image: Any = None
    label: Any = None
    encode_latent: Any = None


class BaseModel:
    def __init__(self, datamodule: Any) -> None:
        self.datamodule_cfg = datamodule
        self.width = int(datamodule["width"])
        self.height = int(datamodule["height"])
        self.channels = int(datamodule["channels"])
        transforms = datamodule.get("transforms") or {}
        self.input_normalize = bool(transforms.get("normalize", False))
        self.input_convert = bool(transforms.get("convert", False))
        self.output_act = "tanh" if self.input_normalize else "sigmoid"
        self.hparams = ConfigNode()
        self.steps_per_epoch: int = 1  # set by the Trainer before init_state
        self.modules: ModuleDict = ModuleDict()
        self.optimizers: OptimizerSet = OptimizerSet()

    # ------------------------------------------------------------------ setup
    def save_hyperparameters(self, **kwargs: Any) -> None:
        for k, v in kwargs.items():
            self.hparams[k] = v

    def make_state(self, rng: jax.Array, init_inputs: Dict[str, tuple]) -> TrainState:
        rng, init_rng = jax.random.split(rng)
        params, mutables = self.modules.init(init_rng, init_inputs)
        opt_states = self.optimizers.init(params)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          mutables=mutables, opt_states=opt_states, rng=rng)

    # ------------------------------------------------------------- data plane
    def preprocess(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """uint8 NHWC -> float in [0,1] (convert) or [-1,1] (normalize)."""
        x = imgs.astype(jnp.float32)
        if self.input_convert:
            x = x / 255.0
        if self.input_normalize:
            x = x * 2.0 - 1.0
        return x

    def dummy_image_batch(self, n: int = 2) -> jnp.ndarray:
        return jnp.zeros((n, self.height, self.width, self.channels), jnp.float32)

    # ------------------------------------------------------- default sampling
    decoder_module_name: str = "decoder"

    def forward(self, state: TrainState, z: jnp.ndarray) -> jnp.ndarray:
        """Decode latents with the generator module (name configurable via
        ``decoder_module_name``).  Used by traversal/2D-grid callbacks.

        Jitted (cached on the model): callbacks call this from host code, and
        an eager decode is hundreds of per-op round trips on a remote-device
        backend (NOTES.md gotchas)."""
        if getattr(self, "_forward_jit", None) is None:
            name = self.decoder_module_name

            def _fwd(params, mutables, z):
                out, _ = self.modules.apply(name, params, mutables, z,
                                            train=False)
                return out

            self._forward_jit = jax.jit(_fwd)
        out = self._forward_jit(state.params, state.mutables, z)
        return out.reshape(z.shape[0], self.height, self.width, self.channels)

    def sample(self, state: TrainState, rng: jax.Array, n: int) -> jnp.ndarray:
        z = jax.random.normal(rng, (n, int(self.hparams["latent_dim"])))
        return self.forward(state, z)

    # ----------------------------------------------------------- step chaining
    def train_step_n(self, state: TrainState, batches):
        """Run ``k`` train steps in ONE device dispatch via ``lax.scan``.

        ``batches`` is a batch pytree with a leading chunk axis ``[k, ...]``.
        Small-model step times (GANs here are ~2-3 ms) are dominated by the
        per-call host->device dispatch, not compute — chaining amortises it
        (the Keras ``steps_per_execution`` idea, TPU-idiomatic as one scan).

        Metrics are the per-key nan-mean over the chunk: phase-alternating
        models (GAN G/D, AGE e/g) emit the other phase's metrics as NaN
        sentinels, so a >=2-step chunk naturally reports BOTH phases —
        stronger than the single-step two-consecutive-sample workaround.
        """
        def body(st, b):
            st2, m = self.train_step(st, b)
            return st2, m

        state, ms = jax.lax.scan(body, state, batches)
        metrics = jax.tree_util.tree_map(lambda v: jnp.nanmean(v, axis=0), ms)
        return state, metrics

    # ------------------------------------------------------------------ hooks
    def init_state(self, rng: jax.Array) -> TrainState:  # pragma: no cover
        raise NotImplementedError

    def train_step(self, state: TrainState, batch):  # pragma: no cover
        raise NotImplementedError

    def validation_step(self, state: TrainState, batch, rng: jax.Array,
                        sample: bool = False):  # pragma: no cover
        raise NotImplementedError

    def on_restore(self, state: TrainState) -> TrainState:
        """Model hook run after checkpoint restore, before training resumes.

        Default: identity.  Models with parameter invariants the optimizer
        must respect (MADE's zeroed-masked kernels) override this to
        re-establish them on checkpoints written by older code."""
        return state

    def on_train_epoch_end(self, trainer) -> None:
        """Host-side hook (InfoGAN traversal grids use this)."""
