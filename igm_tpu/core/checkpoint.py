"""Orbax checkpointing of the full TrainState (SURVEY.md §5 ckpt row).

The saved tree is {step, params, mutables, opt_states, rng}: restoring
reproduces the adversarial alternation phase exactly (step counter) and the
stochastic trajectory (rng key), which Lightning's implicit checkpoints in
the reference do not guarantee.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from .state import TrainState


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        ocp = _ocp()
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: TrainState) -> None:
        ocp = _ocp()
        host_state = jax.device_get(state)
        self._mgr.save(step, args=ocp.args.StandardSave(host_state))

    def restore(self, state_template: TrainState,
                step: Optional[int] = None) -> TrainState:
        ocp = _ocp()
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(jax.device_get(state_template))
        )
        return restored

    def restore_raw(self, step: Optional[int] = None):
        """Restore the saved tree WITHOUT a template (numpy leaves).

        Used to splice a sub-model's weights into a different state tree
        (e.g. LatentDDPM loading a frozen first-stage VQ-VAE whose
        optimizer-state layout we neither know nor need)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
