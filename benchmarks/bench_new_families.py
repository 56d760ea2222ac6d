#!/usr/bin/env python
"""Train-step throughput for the round-3 beyond-parity families:
class-conditional DDPM (+CFG label dropout), latent diffusion, flow
matching, RealNVP, and EDM (UNet + DiT backbones).

The latent model runs with a random frozen first stage — identical FLOPs
to a trained one, so the throughput row is exact.  Same hard-fence
methodology as the all-family sweep (NOTES.md timing rules).

    python benchmarks/bench_new_families.py [--iters 20]
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

CASES = [
    ("ddpm_cond", "ddpm/cond_mnist", 256, []),
    ("latent_ddpm", "latent_ddpm/cifar10", 256, []),
    ("flow_matching", "flow/cifar10", 256, []),
    ("realnvp", "realnvp/cifar10", 256, []),
    ("edm", "edm/cifar10", 256, []),
    ("edm_dit", "edm/cifar10_dit", 256, []),
    ("consistency", "consistency/cifar10", 256, []),
    ("score_sde", "score_sde/cifar10", 256, []),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default="", help="substring filter on names")
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

    for name, exp, bs, extra in CASES:
        if args.only and args.only not in name:
            continue
        try:
            cfg = compose(REPO / "configs",
                          [f"experiment={exp}",
                           f"datamodule.batch_size={bs}", *extra,
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
            n_cls = int(cfg.datamodule.get("n_classes") or 10)
            batch = (rng.integers(0, 255, shape, dtype=np.uint8),
                     rng.integers(0, n_cls, (bs,)).astype(np.int32))
            dev_batch = mesh_lib.shard_batch(mesh, batch)

            lowered = step.lower(state, dev_batch)
            cost = lowered.compile().cost_analysis()
            flops = float(cost.get("flops", 0.0)) if cost else 0.0

            def fence(st):
                return jax.device_get(
                    jax.tree_util.tree_leaves(st.params)[0])

            # recompile consumed the donated buffer? no - lower() doesn't
            # execute; run warmup now
            for _ in range(3):
                state, _ = step(state, dev_batch)
            fence(state)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, _ = step(state, dev_batch)
            fence(state)
            dt = (time.perf_counter() - t0) / args.iters
            print(json.dumps({
                "family": name, "experiment": exp, "batch": bs,
                "steps_per_sec": round(1 / dt, 3),
                "imgs_per_sec": round(bs / dt, 1),
                "flops_per_step_g": round(flops / 1e9, 2),
                "achieved_tflops": round(flops / dt / 1e12, 3)}),
                flush=True)
        except Exception as e:
            print(json.dumps({"family": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
