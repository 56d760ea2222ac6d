"""TrainState: the single pytree carried through every jitted train step.

Replaces the mutable LightningModule state of the reference
(`src/models/base.py:16`): parameters per named module, per-optimizer optax
states, mutable collections (batch_stats), the step counter that drives
adversarial alternation (`src/models/gan.py:45`), and the threaded PRNG key
(every ``torch.randn``/``multinomial`` site becomes an explicit split).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray            # int32 global step
    params: Dict[str, Any]       # module name -> param tree
    mutables: Dict[str, Any]     # module name -> {"batch_stats": ...} or {}
    opt_states: Dict[str, Any]   # optimizer name -> optax state
    rng: jax.Array               # threaded PRNG key

    def next_rng(self, num: int = 1):
        """Split the carried key; returns (new_state, key or list of keys)."""
        keys = jax.random.split(self.rng, num + 1)
        new = self.replace(rng=keys[0])
        if num == 1:
            return new, keys[1]
        return new, list(keys[1:])


def bump(state: TrainState) -> TrainState:
    return state.replace(step=state.step + 1)
