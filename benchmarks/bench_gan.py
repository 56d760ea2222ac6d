#!/usr/bin/env python
"""GAN-family training-step throughput (steps/sec) for the DCGAN configs.

Measures the alternating two-optimizer jitted step (G one step, D the next —
`src/models/gan.py:38-75` semantics) for the cifar10 conv_32 generator/
discriminator at batch 128, the reference's default.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = int(os.environ.get("IGM_BENCH_BATCH", "128"))


def main() -> None:
    import jax
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    from igm_tpu.config import compose
    from igm_tpu.config.instantiate import instantiate

    cfg = compose(Path(__file__).resolve().parent.parent / "configs",
                  ["experiment=lsgan/cifar10", "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    model.steps_per_epoch = 391
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    step = jax.jit(model.train_step, donate_argnums=0)

    rng = np.random.default_rng(0)
    batch = (rng.integers(0, 255, (BATCH, 32, 32, 3), dtype=np.uint8),
             np.zeros((BATCH,), np.int32))
    batch = jax.device_put(batch)

    for _ in range(4):  # warm both cond branches
        state, _ = step(state, batch)
    jax.block_until_ready(state.params)

    iters = 100
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step(state, batch)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "lsgan_cifar10_train_steps_per_sec",
        "value": round(iters / dt, 2),
        "unit": "steps/sec",
        "imgs_per_sec": round(iters * BATCH / dt, 1),
        "batch": BATCH,
    }))


if __name__ == "__main__":
    main()
