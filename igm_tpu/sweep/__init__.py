"""Hyperparameter sweep stack (optuna-style TPE sweeper + joblib-style launcher).

Implements the two Hydra plugins the reference declares
(`/root/reference/requirements.txt:10-11`, `configs/config.yaml:18`) from
scratch: see `space` (override grammar), `tpe` (TPE study), `launcher`
(parallel job execution).  Wired into `run.py -m`.
"""
from .launcher import (Job, JobResult, launch, read_result,  # noqa: F401
                       write_result)
from .space import Dist, dist_from_config, format_value, parse_override  # noqa: F401
from .tpe import Study, Trial  # noqa: F401
