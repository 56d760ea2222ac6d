#!/usr/bin/env python
"""Consistency-model sampling throughput vs batch size (round 4).

At the default sampling-bench batch (64) a 1-eval sampler is dispatch
bound — one denoiser forward is ~0.6 ms of device work behind ~10 ms of
tunnel dispatch.  This script sweeps the batch so the headline number
reflects the device, not the host: the 1-step sampler is ONE UNet forward,
so throughput should approach (train fwd throughput x 3) at saturation.

    python benchmarks/bench_consistency_sampling.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ITERS = 5


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    from igm_tpu.config import to_node
    from igm_tpu.models.consistency import ConsistencyModel

    dm_cfg = to_node({"width": 32, "height": 32, "channels": 3,
                      "transforms": {"convert": True, "normalize": True}})
    model = ConsistencyModel(datamodule=dm_cfg, hidden_dim=64,
                             dim_mults=[1, 2, 4], ema_decay=0.0)
    model.steps_per_epoch = 391
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))

    for batch in (64, 256, 1024, 2048):
        for steps in (1, 2):
            fn = jax.jit(lambda s, r, n=batch, k=steps:
                         model.multistep_sample(s, r, n, steps=k))

            # hard fence: device_get of a computed reduction — over the
            # axon tunnel block_until_ready can return before queued work
            # executes (NOTES.md timing rules; unfenced numbers here read
            # 10-30x too high)
            def fence(x):
                return float(jax.device_get(jnp.sum(x)))

            fence(fn(state, jax.random.PRNGKey(1)))
            t0 = time.perf_counter()
            acc = 0.0
            for i in range(ITERS):
                acc += fence(fn(state, jax.random.PRNGKey(2 + i)))
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": f"consistency_cifar10_{steps}step_samples_per_sec",
                "value": round(batch * ITERS / dt, 1),
                "unit": "samples/sec", "batch": batch, "nfe": steps}),
                flush=True)


if __name__ == "__main__":
    main()
