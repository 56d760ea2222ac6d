#!/usr/bin/env python
"""MADE bf16-WEIGHT-storage A/B (round-4 VERDICT ask #5).

The MADE step is HBM-bound on the 1024x200704 output layer; with bf16
moments adopted (round 3), W's fwd+dgrad+dW legs are ~45% of the minimal
~6.6 GB per-step traffic (docs/MFU_AR.md).  This measures the last lever:
storing the output-layer KERNEL in bf16 with stochastic-rounded updates
(core/optim.apply_updates_sr; model knob ``weight_dtype`` /
``IGM_MADE_WDTYPE``), with the usual 100-step bpd-trajectory validation
against the f32 arm.

    python benchmarks/made_wdtype_ab.py [--steps 100] [--batch 128]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_arm(wdtype: str, steps: int, batch: int) -> dict:
    os.environ["IGM_MADE_WDTYPE"] = wdtype
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    import numpy as np

    from igm_tpu.config import to_node
    from igm_tpu.models.made import MADE
    from igm_tpu.parallel import mesh as mesh_lib
    from igm_tpu.utils.platform import apply_platform_env, apply_prng_env

    apply_platform_env()
    apply_prng_env()

    dm = to_node({"width": 28, "height": 28, "channels": 1,
                  "transforms": {"convert": True, "normalize": False}})
    model = MADE(datamodule=dm, hidden_dim=1024, n_layer=3)
    model.steps_per_epoch = 391
    mesh = mesh_lib.make_mesh()
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    state = mesh_lib.replicate(mesh, state)
    step = jax.jit(model.train_step, donate_argnums=0)

    rng = np.random.default_rng(0)
    batch_np = (rng.integers(0, 255, (batch, 28, 28, 1), dtype=np.uint8),
                np.zeros((batch,), np.int32))
    dev_batch = mesh_lib.shard_batch(mesh, batch_np)

    def fence(st):
        return jax.device_get(jax.tree_util.tree_leaves(st.params)[0])

    losses = []
    for _ in range(3):
        state, m = step(state, dev_batch)
    fence(state)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, dev_batch)
        losses.append(m)
    fence(state)
    dt = time.perf_counter() - t0
    traj = [float(jax.device_get(m["train_bpd"])) for m in losses[::10]]
    return {"family": "made", "weight_dtype": wdtype, "batch": batch,
            "steps_per_sec": round(steps / dt, 3),
            "trajectory": [round(x, 5) for x in traj]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--arm", choices=["float32", "bfloat16", "both"],
                    default="both")
    args = ap.parse_args()
    if args.arm != "both":
        print(json.dumps(run_arm(args.arm, args.steps, args.batch)))
        return
    for wdtype in ("float32", "bfloat16"):
        # one subprocess per arm: the env knob is read at model build
        out = subprocess.run(
            [sys.executable, __file__, "--steps", str(args.steps),
             "--batch", str(args.batch), "--arm", wdtype],
            capture_output=True, text=True)
        sys.stderr.write(out.stderr[-400:])
        print(out.stdout.strip().splitlines()[-1] if out.stdout.strip()
              else json.dumps({"error": out.returncode, "arm": wdtype}),
              flush=True)


if __name__ == "__main__":
    main()
