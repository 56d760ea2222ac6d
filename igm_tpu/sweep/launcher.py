"""Multirun job launchers: sequential (basic) and parallel (joblib-style).

The reference selects the joblib launcher for multiruns
(`/root/reference/configs/config.yaml:18` `override hydra/launcher: joblib`),
which runs each sweep job in its own worker process.  The TPU-native
equivalent launches each job as an independent `run.py` subprocess (own JAX
runtime, own device claim) with a bounded worker pool; the parent collects
each job's `optimized_metric` from a result file in its run dir.

NOTE: jobs that target the single real TPU chip must not run concurrently
(one device claim at a time) - `n_jobs` only parallelises CPU runs; the
default -1 resolves to the host CPU count.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, List, Optional

RESULT_FILE = "optimized_metric.json"


@dataclass
class Job:
    overrides: List[str]
    subdir: str


def read_result(run_dir: Path) -> Optional[float]:
    path = Path(run_dir) / RESULT_FILE
    if not path.exists():
        return None
    try:
        return float(json.loads(path.read_text())["optimized_metric"])
    except (ValueError, KeyError, json.JSONDecodeError):
        return None


def write_result(run_dir: Path, value) -> None:
    try:
        value = float(value)
    except (TypeError, ValueError):
        return
    (Path(run_dir) / RESULT_FILE).write_text(
        json.dumps({"optimized_metric": value}))


@dataclass
class JobResult:
    ok: bool                       # job process / call succeeded
    value: Optional[float] = None  # optimized_metric, if the run produced one


def _run_subprocess(run_py, job: Job, sweep_dir: Path) -> JobResult:
    run_dir = Path(sweep_dir) / job.subdir
    # run_py: a run.py path, or a full argv prefix (installed package
    # re-enters via `python -m igm_tpu.cli`)
    prefix = ([sys.executable, str(run_py)]
              if isinstance(run_py, (str, Path)) else [str(a) for a in run_py])
    cmd = [*prefix, *job.overrides, f"hydra.run.dir={run_dir}"]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        sys.stderr.write(f"[launcher] job {job.subdir} failed "
                         f"(rc={proc.returncode}):\n{proc.stderr[-4000:]}\n")
        return JobResult(ok=False)
    return JobResult(ok=True, value=read_result(run_dir))


def launch(jobs: List[Job], launcher_cfg, sweep_dir: Path, run_py,
           run_inline: Optional[Callable[[Job], Optional[float]]] = None,
           ) -> List[JobResult]:
    """Run `jobs`; each JobResult carries success + optimized_metric."""
    kind = str(launcher_cfg.get("_target_", "basic")) if launcher_cfg else "basic"
    if kind == "joblib":
        n_jobs_cfg = launcher_cfg.get("n_jobs")
        if n_jobs_cfg in (None, "null"):
            n_jobs = 1  # joblib.Parallel default; single-TPU-safe
        else:
            n_jobs = int(n_jobs_cfg)
            if n_jobs <= 0:
                n_jobs = os.cpu_count() or 1
        n_jobs = max(1, min(n_jobs, len(jobs)))
        with ThreadPoolExecutor(max_workers=n_jobs) as pool:
            futures = [pool.submit(_run_subprocess, run_py, j, sweep_dir)
                       for j in jobs]
            return [f.result() for f in futures]
    # basic: sequential, in-process when the caller provides a runner
    # (preserves the pre-round-3 multirun behaviour and its shared caches)
    results: List[JobResult] = []
    for job in jobs:
        if run_inline is not None:
            results.append(JobResult(ok=True, value=run_inline(job)))
        else:
            results.append(_run_subprocess(run_py, job, sweep_dir))
    return results
