#!/usr/bin/env python
"""bf16-first-moment A/B for larger-state families (VERDICT r2 #7).

Round 2 measured the policy on MADE only (+7% step, trajectory within
0.014 bpd of f32 over 100 steps).  This script runs the same protocol on
any family: throughput with f32 vs bf16 Adam first moments, plus a
100-step loss-trajectory delta, and prints one JSON line per arm.

    python benchmarks/bf16_moments_ab.py --family ddpm [--steps 100]

The decision per family class is recorded in NOTES.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_arm(family: str, mu_bf16: bool, steps: int, batch: int):
    os.environ["IGM_MU_DTYPE"] = "bfloat16" if mu_bf16 else "float32"
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import numpy as np

    sys.path.insert(0, str(REPO / "tools"))
    from profile_ddpm import build_step
    state, step, dev_batch = build_step(family, batch)

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
    loss_key = next(k for k in losses[0] if "loss" in k or "bpd" in k)
    traj = [float(jax.device_get(m[loss_key])) for m in losses[::10]]
    return {"family": family, "mu_dtype": os.environ["IGM_MU_DTYPE"],
            "steps_per_sec": round(steps / dt, 3), "loss_key": loss_key,
            "trajectory": [round(x, 5) for x in traj]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="ddpm")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--arm", choices=["f32", "bf16", "both"], default="both")
    args = ap.parse_args()
    arms = {"f32": [False], "bf16": [True], "both": [False, True]}[args.arm]
    for mu_bf16 in arms:
        # separate subprocess per arm so IGM_MU_DTYPE is read at model build
        if len(arms) == 2:
            import subprocess
            out = subprocess.run(
                [sys.executable, __file__, "--family", args.family,
                 "--steps", str(args.steps), "--batch", str(args.batch),
                 "--arm", "bf16" if mu_bf16 else "f32"],
                capture_output=True, text=True)
            sys.stderr.write(out.stderr[-400:])
            print(out.stdout.strip().splitlines()[-1] if out.stdout else
                  json.dumps({"error": out.returncode}))
        else:
            print(json.dumps(run_arm(args.family, mu_bf16, args.steps,
                                     args.batch)))


if __name__ == "__main__":
    main()
