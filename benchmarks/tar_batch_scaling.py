#!/usr/bin/env python
"""TAR throughput vs batch size (docs/MFU_AR.md round-3 follow-up).

At the reference batch 128 / S=785 the step is attention-compute-bound
(the dropout ladder in NOTES.md).  The per-GEMM shapes of the qkv/MLP
projections are (B*S, 256)x(256, *) — M already huge, K/N fixed — so
batch scaling mostly amortises fixed overheads + the softmax/probs
sweeps; this measures how much is actually there.

    python benchmarks/tar_batch_scaling.py [--batches 64,128,256,512]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128,256,512")
    ap.add_argument("--iters", type=int, default=20)
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
        try:
            cfg = compose(REPO / "configs",
                          ["experiment=tar/mnist",
                           f"datamodule.batch_size={bs}",
                           "print_config=False"])
            model = instantiate(cfg.model, datamodule=cfg.datamodule)
            model.steps_per_epoch = max(60000 // bs, 1)
            mesh = mesh_lib.make_mesh()
            state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
            state = mesh_lib.replicate(mesh, state)
            step = jax.jit(model.train_step, donate_argnums=0)
            rng = np.random.default_rng(0)
            shape = (bs, int(cfg.datamodule.height),
                     int(cfg.datamodule.width), int(cfg.datamodule.channels))
            batch = (rng.integers(0, 255, shape, dtype=np.uint8),
                     np.zeros((bs,), np.int32))
            dev_batch = mesh_lib.shard_batch(mesh, batch)

            def fence(st):
                return jax.device_get(
                    jax.tree_util.tree_leaves(st.params)[0])

            for _ in range(3):
                state, _ = step(state, dev_batch)
            fence(state)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, _ = step(state, dev_batch)
            fence(state)
            dt = (time.perf_counter() - t0) / args.iters
            print(json.dumps({"family": "tar", "batch": bs,
                              "steps_per_sec": round(1 / dt, 3),
                              "imgs_per_sec": round(bs / dt, 1)}),
                  flush=True)
        except Exception as e:  # OOM at large batch is a result, not a crash
            print(json.dumps({"family": "tar", "batch": bs,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
