#!/usr/bin/env python
"""DiT-backbone train-step throughput + MFU vs the parity UNet flagship.

The claim under test (networks/dit.py, docs/MFU.md): the conv UNet's ~41%
architectural MFU ceiling (64-wide convs half-fill the MXU) does not bind
a GEMM-dominated transformer denoiser — DiT should land materially above
the UNet's measured 0.326 flagship MFU at the same image/batch shape.

Same hard-fence methodology as the all-family sweep (NOTES.md timing
rules: device_get of a small param leaf, warmup pre-timed, one TPU
process at a time).

    python benchmarks/bench_dit.py [--iters 30] [--batch 256]
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

# (name, experiment, extra overrides) — width/depth sweep sized so the
# middle row roughly FLOP-matches the parity UNet step (1.28 TF @ b256).
CASES = [
    ("dit_256x8", "ddpm/cifar10_dit",
     ["model.hidden_dim=256", "model.depth=8", "model.heads=4"]),
    ("dit_384x8", "ddpm/cifar10_dit", []),
    ("dit_512x12", "ddpm/cifar10_dit",
     ["model.hidden_dim=512", "model.depth=12", "model.heads=8"]),
    ("dit_768x12", "ddpm/cifar10_dit",
     ["model.hidden_dim=768", "model.depth=12", "model.heads=12"]),
    # round-4 width push (docs/MFU.md: width is the MFU lever) — 1024-wide,
    # with and without remat (activation memory vs recompute FLOPs)
    ("dit_1024x12", "ddpm/cifar10_dit",
     ["model.hidden_dim=1024", "model.depth=12", "model.heads=16"]),
    ("dit_1024x12_remat", "ddpm/cifar10_dit",
     ["model.hidden_dim=1024", "model.depth=12", "model.heads=16",
      "+model.remat=true"]),
    ("dit_1280x16", "ddpm/cifar10_dit",
     ["model.hidden_dim=1280", "model.depth=16", "model.heads=16"]),
    ("flow_dit_384x8", "flow/cifar10_dit", []),
    # round-4 Switch-MoE rows (networks/moe.py): same 768x12 trunk, E=8
    # experts on every 2nd MLP — measures the sparse-MLP overhead (router +
    # dispatch) at the single-chip scale, and A/Bs the two dispatch
    # algorithms (einsum one-hot matmuls vs unique-slot scatter/gather;
    # b256 x 256 tokens = 65k tokens >> width, the scatter regime)
    ("dit_moe8_768x12_scatter", "ddpm/cifar10_dit",
     ["model.hidden_dim=768", "model.depth=12", "model.heads=12",
      "+model.moe_experts=8", "+model.moe_every=2",
      "+model.moe_dispatch=scatter"]),
    ("dit_moe8_768x12_einsum", "ddpm/cifar10_dit",
     ["model.hidden_dim=768", "model.depth=12", "model.heads=12",
      "+model.moe_experts=8", "+model.moe_every=2",
      "+model.moe_dispatch=einsum"]),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--tiny", action="store_true",
                    help="shrink every case (script-mechanics smoke on CPU)")
    ap.add_argument("--only", default="",
                    help="substring filter on case names")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    import numpy as np

    import bench as bench_mod
    from igm_tpu.config import compose, instantiate
    from igm_tpu.parallel import mesh as mesh_lib
    from igm_tpu.utils.platform import apply_platform_env, apply_prng_env

    apply_platform_env()
    apply_prng_env()
    bs = args.batch

    dev = jax.devices()[0]
    peak = bench_mod._peak_flops(getattr(dev, "device_kind", ""), dev.platform)

    for name, exp, extra in CASES:
        if args.only and args.only not in name:
            continue
        try:
            if args.tiny:
                extra = ["model.hidden_dim=32", "model.depth=2",
                         "model.heads=2", "model.timesteps=8"]
                if exp.startswith("flow/"):
                    extra = extra[:3]
            cfg = compose(REPO / "configs",
                          [f"experiment={exp}",
                           f"datamodule.batch_size={bs}",
                           "model.ema_decay=0", *extra,
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
                     rng.integers(0, 10, (bs,)).astype(np.int32))
            dev_batch = mesh_lib.shard_batch(mesh, batch)

            cost = step.lower(state, dev_batch).compile().cost_analysis()
            flops = float(cost.get("flops", 0.0)) if cost else 0.0

            def fence(st):
                return jax.device_get(
                    jax.tree_util.tree_leaves(st.params)[0])

            for _ in range(5):
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
                "achieved_tflops": round(flops / dt / 1e12, 3),
                "mfu": round(flops / dt / peak, 4) if peak else None}),
                flush=True)
            del state, step
        except Exception as e:
            print(json.dumps({"family": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
