"""Train driver (parity: src/train.py).

``train(config)``: seed -> instantiate datamodule -> model (non-recursive,
datamodule passed as *config*, `src/train.py:27`) -> callbacks -> logger ->
Trainer -> fit.  Returns ``optimized_metric`` for sweepers.
"""
from __future__ import annotations

from typing import Any, List

from .config import instantiate
from .utils.utils import count_params, get_logger

log = get_logger(__name__)


def extras(config: Any) -> None:
    """Debug-mode conveniences (parity: src/utils/utils.py:35-76)."""
    import os
    from .utils.platform import apply_platform_env
    apply_platform_env()
    if os.environ.get("IGM_MULTIHOST") == "1":
        # pod-slice SPMD: same code path, global mesh (docs/SCALING.md)
        import jax
        jax.distributed.initialize()
    try:
        # persistent compile cache: repeat runs skip the multi-minute XLA
        # compiles (critical over a remote-compile tunnel)
        import jax
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    if config.get("ignore_warnings"):
        import warnings
        warnings.filterwarnings("ignore")
    if config.get("debug"):
        log.info("debug mode: forcing fast_dev_run")
        config["trainer"]["fast_dev_run"] = True
    if config.get("debug_nans"):
        import jax
        jax.config.update("jax_debug_nans", True)


def train(config: Any):
    extras(config)
    if not config.get("model") or not config.get("datamodule"):
        raise SystemExit(
            "No model/datamodule selected. Pick an experiment, e.g.\n"
            "    python run.py experiment=vae/mnist_mlp\n"
            "or select groups directly:\n"
            "    python run.py model=gan networks=conv_mnist datamodule=mnist\n"
            "Available experiments: ls configs/experiment/*/")
    datamodule = instantiate(config.datamodule)
    log.info("Instantiated datamodule <%s>", config.datamodule._target_)

    model = instantiate(config.model, datamodule=config.datamodule)
    log.info("Instantiated model <%s>", config.model._target_)

    callbacks: List[Any] = []
    if "callbacks" in config and config.callbacks:
        for _, cb_conf in config.callbacks.items():
            if isinstance(cb_conf, dict) and "_target_" in cb_conf:
                callbacks.append(instantiate(cb_conf))

    logger = instantiate(config.logger) if config.get("logger") else None

    trainer = instantiate(config.trainer, callbacks=callbacks, logger=logger)
    if config.get("seed") is not None:
        trainer.seed = int(config["seed"])

    trainer.fit(model=model, datamodule=datamodule)
    if trainer.state is not None:
        log.info("trained params: %s", count_params(trainer.state.params))

    if config.get("test_after_training") and not trainer.fast_dev_run:
        log.info("Starting testing!")
        trainer.test()

    metric = config.get("optimized_metric")
    if metric:
        return trainer.callback_metrics.get(metric)
    return None
