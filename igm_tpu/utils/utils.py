"""Logging / config-printing helpers (parity: src/utils/utils.py).

Process-zero guarding mirrors the reference's rank-zero decorators
(`/root/reference/src/utils/utils.py:13-32`); under jax.distributed the guard
is ``jax.process_index() == 0``.
"""
from __future__ import annotations

import functools
import logging
from typing import Any

import yaml


def _is_rank_zero() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def rank_zero_only(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if _is_rank_zero():
            return fn(*args, **kwargs)
        return None
    return wrapped


def get_logger(name: str = "igm_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers and not logging.getLogger().handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("[%(asctime)s][%(name)s][%(levelname)s] %(message)s"))
        logger.addHandler(handler)
    if logger.handlers:
        # absl (pulled in by orbax) later installs a root handler; without
        # this, every record prints twice once checkpointing is enabled
        logger.propagate = False
    return logger


@rank_zero_only
def print_config(config: Any, resolve: bool = True) -> None:
    """Pretty-print the composed config and dump it to config_tree.txt.

    (Reference uses rich trees, `utils.py:80-118`; plain YAML here.)
    """
    from igm_tpu.config import to_plain

    text = yaml.safe_dump(to_plain(config), default_flow_style=False, sort_keys=False)
    print("=" * 30 + " CONFIG " + "=" * 30)
    print(text)
    print("=" * 68)
    try:
        with open("config_tree.txt", "w") as fh:
            fh.write(text)
    except OSError:
        pass


def count_params(tree: Any) -> int:
    import jax
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
