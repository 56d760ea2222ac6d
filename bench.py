#!/usr/bin/env python
"""Headline benchmark: DDPM CIFAR-10 training-step throughput (imgs/sec).

Runs the flagship config's exact training step (UNet dim=64, mults [1,2,4],
1000-timestep cosine schedule, l1 eps-loss, Adam) on random CIFAR-shaped
uint8 data, jitted with donated state on the default device (TPU under the
driver).  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "imgs/sec", "vs_baseline": R}

Baseline: the reference (PyTorch-Lightning, `src/models/ddpm.py`) publishes
no numbers (SURVEY.md §6).  BASELINE_IMGS_PER_SEC below is our recorded
estimate of the reference's single-V100 throughput for this exact UNet/batch
(fp32 torch, batch 128, ~0.7s/step ≈ 180 imgs/s) — the best available
stand-in until a measured reference number exists; vs_baseline is
value / BASELINE_IMGS_PER_SEC.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

import os

BASELINE_IMGS_PER_SEC = 180.0
BATCH = int(os.environ.get("IGM_BENCH_BATCH", "256"))
WARMUP = 3
ITERS = int(os.environ.get("IGM_BENCH_ITERS", "20"))


def main() -> None:
    import jax
    import numpy as np

    # persistent compile cache: repeat bench invocations skip the ~minutes
    # XLA compile of the UNet train step
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from igm_tpu.config import to_node
    from igm_tpu.models.ddpm import DDPM
    from igm_tpu.parallel import mesh as mesh_lib

    dm_cfg = to_node({
        "width": 32, "height": 32, "channels": 3,
        "transforms": {"convert": True, "normalize": True},
    })
    model = DDPM(datamodule=dm_cfg, hidden_dim=64, timesteps=1000,
                 dim_mults=[1, 2, 4], loss_type="l1", lr=1e-4, b1=0.9,
                 b2=0.999,
                 compute_dtype=os.environ.get("IGM_BENCH_DTYPE", "auto"))
    model.steps_per_epoch = 391  # 50000 / 128, matches the real config

    mesh = mesh_lib.make_mesh()
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    state = mesh_lib.replicate(mesh, state)
    step = jax.jit(model.train_step, donate_argnums=0)

    rng = np.random.default_rng(0)
    batch = (rng.integers(0, 255, (BATCH, 32, 32, 3), dtype=np.uint8),
             np.zeros((BATCH,), np.int32))
    dev_batch = mesh_lib.shard_batch(mesh, batch)

    for _ in range(WARMUP):
        state, metrics = step(state, dev_batch)
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, dev_batch)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "ddpm_cifar10_train_imgs_per_sec",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
