#!/usr/bin/env python
"""MADE throughput vs batch size: the TPU-first answer to its HBM wall.

docs/MFU_AR.md derives that MADE's step is optimizer-state traffic (the
822 MB output layer dominates; a >=5x STEP-RATE win over a V100 at the
reference batch 128 is physically closed off because the V100 has more
HBM bandwidth).  The TPU-first throughput lever is batch scaling — the
weight/moment traffic is per-STEP, so imgs/s should rise near-linearly
with batch until the activation sweeps take over.  This measures it.

    python benchmarks/made_batch_scaling.py [--batches 128,256,512,1024]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,256,512,1024")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    import numpy as np

    from igm_tpu.config import compose, instantiate
    from igm_tpu.parallel import mesh as mesh_lib
    from igm_tpu.utils.platform import apply_platform_env, apply_prng_env

    apply_platform_env()
    apply_prng_env()

    for bs in [int(b) for b in args.batches.split(",")]:
        cfg = compose(REPO / "configs",
                      ["experiment=made/mnist", f"datamodule.batch_size={bs}",
                       "print_config=False"])
        model = instantiate(cfg.model, datamodule=cfg.datamodule)
        model.steps_per_epoch = max(60000 // bs, 1)
        mesh = mesh_lib.make_mesh()
        state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
        state = mesh_lib.replicate(mesh, state)
        step = jax.jit(model.train_step, donate_argnums=0)
        rng = np.random.default_rng(0)
        shape = (bs, int(cfg.datamodule.height), int(cfg.datamodule.width),
                 int(cfg.datamodule.channels))
        batch = (rng.integers(0, 255, shape, dtype=np.uint8),
                 np.zeros((bs,), np.int32))
        dev_batch = mesh_lib.shard_batch(mesh, batch)

        def fence(st):
            return jax.device_get(jax.tree_util.tree_leaves(st.params)[0])

        for _ in range(3):
            state, _ = step(state, dev_batch)
        fence(state)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, _ = step(state, dev_batch)
        fence(state)
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"family": "made", "batch": bs,
                          "steps_per_sec": round(1 / dt, 3),
                          "imgs_per_sec": round(bs / dt, 1)}))


if __name__ == "__main__":
    main()
