"""ModuleDict: named Flax modules with uniform init/apply.

Bridges the reference's ``self.netG = instantiate(...)`` object style
(`src/models/gan.py:22-23`) to functional JAX: a model owns a ModuleDict and
all parameters/batch-stats live in the TrainState, keyed by module name.
"""
from __future__ import annotations

import inspect
from typing import Any, Dict, Optional, Tuple

import jax


class ModuleDict:
    def __init__(self, **modules: Any):
        self.modules = dict(modules)
        self._takes_train = {
            name: "train" in inspect.signature(type(m).__call__).parameters
            for name, m in modules.items()
        }

    def __getitem__(self, name: str):
        return self.modules[name]

    def init(self, rng: jax.Array, inputs: Dict[str, tuple],
             ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Initialise every module; ``inputs[name]`` are example args.

        Returns (params, mutables) keyed by module name.  Modules without
        mutable collections get an empty dict entry so the pytree structure
        is static across models.
        """
        params: Dict[str, Any] = {}
        mutables: Dict[str, Any] = {}
        for name, module in self.modules.items():
            rng, p_rng, d_rng = jax.random.split(rng, 3)
            args = inputs[name]
            variables = dict(module.init({"params": p_rng, "dropout": d_rng}, *args))
            # A module may hold NO trainable params (e.g. the EMA-codebook
            # VectorQuantizer keeps everything in a mutable collection).
            params[name] = variables.pop("params", {})
            mutables[name] = {k: dict(v) if hasattr(v, "keys") else v
                              for k, v in variables.items()}
        return params, mutables

    def apply(
        self,
        name: str,
        params: Dict[str, Any],
        mutables: Dict[str, Any],
        *args: Any,
        train: bool = True,
        update_stats: bool = True,
        rngs: Optional[Dict[str, jax.Array]] = None,
        **kwargs: Any,
    ):
        """Apply module ``name``; returns (output, updated_mutables_for_name).

        In train mode, batch-stats collections update (torch train-mode BN
        parity — SURVEY.md §7 hard-part 3); in eval mode running averages are
        used and mutables pass through unchanged.  ``update_stats=False``
        keeps train-mode normalisation (batch statistics) but does NOT record
        them — needed when differentiating through the module a second time
        (WGAN-GP gradient penalty).
        """
        module = self.modules[name]
        own_mut = mutables.get(name, {})
        variables = {"params": params[name], **own_mut}
        if self._takes_train[name]:
            kwargs = dict(kwargs, train=train)
        if train and own_mut and update_stats:
            out, new_vars = module.apply(variables, *args, rngs=rngs,
                                         mutable=list(own_mut.keys()), **kwargs)
            return out, dict(new_vars)
        out = module.apply(variables, *args, rngs=rngs, **kwargs)
        return out, own_mut
