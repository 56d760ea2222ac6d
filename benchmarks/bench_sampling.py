#!/usr/bin/env python
"""DDPM ancestral-sampling throughput (samples/sec/chip).

The reference's hottest inference loop (SURVEY.md §3.4): 1000 sequential
UNet forwards per batch, a Python loop in torch (`src/models/ddpm.py:399`).
Here the whole chain is one compiled lax.scan; this script measures
end-to-end samples/sec for the CIFAR-10 flagship config.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = int(os.environ.get("IGM_BENCH_BATCH", "64"))


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    from igm_tpu.config import to_node
    from igm_tpu.models.ddpm import DDPM

    dm_cfg = to_node({"width": 32, "height": 32, "channels": 3,
                      "transforms": {"convert": True, "normalize": True}})
    model = DDPM(datamodule=dm_cfg, hidden_dim=64, timesteps=1000,
                 dim_mults=[1, 2, 4])
    model.steps_per_epoch = 391
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))

    sample = jax.jit(lambda s, r: model.sample(s, r, BATCH))
    out = sample(state, jax.random.PRNGKey(1))
    jax.block_until_ready(out)

    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = sample(state, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "ddpm_cifar10_samples_per_sec",
        "value": round(BATCH * iters / dt, 3),
        "unit": "samples/sec",
        "batch": BATCH,
        "timesteps": 1000,
    }))

    # DDIM-50 (beyond-parity fast sampler, models/ddpm.py ddim_sample)
    ddim = jax.jit(lambda s, r: model.ddim_sample(s, r, BATCH, steps=50))
    out = ddim(state, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = ddim(state, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "ddpm_cifar10_ddim50_samples_per_sec",
        "value": round(BATCH * iters / dt, 3),
        "unit": "samples/sec",
        "batch": BATCH,
        "timesteps": 50,
    }))


if __name__ == "__main__":
    main()
