"""``_target_``-based object instantiation (hydra.utils.instantiate stand-in).

The reference instantiates every component from config via
``hydra.utils.instantiate`` with ``_recursive_=False`` at the model level
(`/root/reference/src/train.py:27`) — nested network configs are passed
through as plain config and instantiated lazily by the model with channel
counts injected (`src/models/gan.py:22-23`).  This module reproduces that
contract: instantiation is always non-recursive.

Reference-style targets (``src.models.gan.GAN``) are transparently aliased to
the igm_tpu equivalents so the reference's own YAML trees also compose.
"""
from __future__ import annotations

import importlib
from typing import Any

from .node import ConfigNode

# src.* (reference tree) -> igm_tpu module path
_TARGET_ALIASES = {
    "src.models": "igm_tpu.models",
    "src.networks": "igm_tpu.networks",
    "src.datamodules": "igm_tpu.data",
    "src.callbacks": "igm_tpu.callbacks",
    "src.utils": "igm_tpu.utils",
    "pytorch_lightning.Trainer": "igm_tpu.core.trainer.Trainer",
    "pytorch_lightning.loggers.tensorboard.TensorBoardLogger":
        "igm_tpu.core.logging.TensorBoardLogger",
    "pytorch_lightning.callbacks.progress.TQDMProgressBar":
        "igm_tpu.callbacks.util.ProgressBar",
}


def resolve_target(target: str) -> Any:
    for prefix, repl in _TARGET_ALIASES.items():
        if target == prefix:
            target = repl
            break
        if target.startswith(prefix + "."):
            target = repl + target[len(prefix):]
            break
    module_path, _, attr = target.rpartition(".")
    if not module_path:
        raise ImportError(f"bad target: {target!r}")
    module = importlib.import_module(module_path)
    try:
        return getattr(module, attr)
    except AttributeError as e:
        raise ImportError(f"{target!r}: module {module_path!r} has no {attr!r}") from e


def instantiate(cfg: Any, /, **kwargs: Any) -> Any:
    """Instantiate ``cfg['_target_']`` with the config's keys as kwargs.

    Non-recursive: nested ConfigNode values are passed through untouched.
    Explicit ``kwargs`` override config keys (mirrors the reference's
    ``instantiate(netG, input_channel=..., output_channel=...)`` pattern).
    """
    if cfg is None:
        raise TypeError("instantiate(None)")
    if not isinstance(cfg, dict):
        # accept any Mapping (e.g. flax FrozenDict when a config rides
        # through a flax Module attribute)
        try:
            cfg = dict(cfg)
        except TypeError:
            raise TypeError(
                f"instantiate expects a config mapping, got {type(cfg)}")
    if "_target_" not in cfg:
        raise ValueError(f"config has no _target_: {list(cfg.keys())}")
    cls = resolve_target(str(cfg["_target_"]))
    call_kwargs = {
        k: v
        for k, v in cfg.items()
        if k not in ("_target_", "_recursive_", "_convert_", "defaults")
    }
    call_kwargs.update(kwargs)
    return cls(**call_kwargs)
