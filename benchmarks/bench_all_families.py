#!/usr/bin/env python
"""Training-step throughput sweep across ALL model families (VERDICT item 4).

One row per family, composed from its own experiment config (real model
sizes, real per-config batch size), jitted train step timed on synthetic
uint8 input (input content doesn't change step time; the data pipeline is
benchmarked separately).  BASELINE target: >= 5x the reference's step
throughput on every experiment — the reference publishes no numbers, so
rows are compared against the per-family V100-roofline bracket documented
in benchmarks/BASELINE_DERIVATION.md.

    python benchmarks/bench_all_families.py [--iters 50] [--out results.json]
    python benchmarks/bench_all_families.py --families ddpm,vae   # subset

Device-wedge-safe like bench.py: probes the backend in a subprocess first.
Each family also records FLOPs/step from XLA cost analysis, so the JSON
carries achieved-FLOPs and MFU per family.
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

# family -> (overrides, notes).  Flagship dataset per family; batch size
# comes from the composed config (reference default 128).
SWEEP = {
    "vanilla_gan": ["experiment=vanilla_gan/cifar10"],
    "lsgan":       ["experiment=lsgan/cifar10"],
    "ggan":        ["experiment=ggan/cifar10"],
    "speed_gan":   ["experiment=vanilla_gan/cifar10", "model=speed_gan"],
    "wgan":        ["experiment=wgan/cifar10"],
    "wgan_gp":     ["experiment=wgan_gp/cifar10"],
    "infogan":     ["experiment=infogan/mnist"],
    "bigan":       ["experiment=bigan/cifar10"],
    "aae":         ["experiment=aae/mnist"],
    "age":         ["experiment=age/cifar10"],
    "vae":         ["experiment=vae/cifar10"],
    "cvae":        ["experiment=cvae/cifar10"],
    "beta_vae":    ["experiment=beta_vae/celeba"],
    "factor_vae":  ["experiment=factor_vae/celeba"],
    "vaegan":      ["experiment=vaegan/cifar10"],
    "vqvae":       ["experiment=vqvae/cifar10"],
    "made":        ["experiment=made/mnist"],
    "pixelcnn":    ["experiment=pixelcnn/cifar10"],
    "tar":         ["experiment=tar/mnist"],
    "ddpm":        ["experiment=ddpm/cifar10"],
}


def bench_family(name: str, overrides: list, iters: int, warmup: int,
                 chain: int = 1) -> dict:
    import jax
    import numpy as np

    from igm_tpu.config import compose, instantiate

    cfg = compose(REPO / "configs", [*overrides, "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    model.steps_per_epoch = 391
    batch_size = int(cfg.datamodule.batch_size)
    h, w = int(cfg.datamodule.height), int(cfg.datamodule.width)
    c = int(cfg.datamodule.channels)

    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    # chain > 1: K steps per dispatch (trainer steps_per_execution path) —
    # measures device throughput with host dispatch amortised
    if chain > 1:
        step = jax.jit(model.train_step_n, donate_argnums=0)
    else:
        step = jax.jit(model.train_step, donate_argnums=0)

    rng = np.random.default_rng(0)
    lead = (chain,) if chain > 1 else ()
    batch = (rng.integers(0, 255, (*lead, batch_size, h, w, c),
                          dtype=np.uint8),
             rng.integers(0, 10, (*lead, batch_size)).astype(np.int32))
    batch = jax.device_put(batch)

    flops = None
    try:
        cost = step.lower(state, batch).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    # HARD completion fence: device_get of a param leaf.  block_until_ready
    # over the axon tunnel can return before the donated-state chain has
    # actually executed (measured: the first model in a process then "runs"
    # at host-dispatch rate, ~2400 steps/s, while later models absorb the
    # backlog) — a host transfer of a computed leaf cannot lie.
    def fence(st):
        return jax.device_get(jax.tree_util.tree_leaves(st.params)[0])

    # warm every step-index branch (GAN alternation, n_critic ratios, ...)
    for _ in range(warmup):
        state, metrics = step(state, batch)
    fence(state)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    fence(state)
    dt = time.perf_counter() - t0

    # Phase-alternating models (GAN G/D, AGE e/g) emit the OTHER phase's
    # metrics as NaN sentinels on purpose, so "finite" means: at least one
    # loss metric from the final step's phase is finite.
    loss_vals = [float(jax.device_get(metrics[k])) for k in metrics
                 if "loss" in k]
    finite = [v for v in loss_vals if np.isfinite(v)]
    n_steps = iters * chain
    row = {
        "family": name,
        "experiment": overrides[0].split("=", 1)[1],
        "batch": batch_size, "image": f"{h}x{w}x{c}",
        "steps_per_sec": round(n_steps / dt, 3),
        "imgs_per_sec": round(batch_size * n_steps / dt, 1),
        "loss_finite": bool(finite) or not loss_vals,
    }
    if chain > 1:
        row["chain"] = chain
    if flops:
        # XLA cost analysis counts a lax.scan body ONCE (trip count is not
        # folded in), so `flops` is per-STEP for both paths
        row["flops_per_step_g"] = round(flops / 1e9, 2)
        row["achieved_tflops"] = round(flops * n_steps / dt / 1e12, 3)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=6)
    ap.add_argument("--chain", type=int, default=1,
                    help="steps per dispatch (steps_per_execution path)")
    ap.add_argument("--families", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--no-isolate", dest="isolate", action="store_false",
                    help="run families in-process (default: subprocess each)")
    ap.add_argument("--no-probe", dest="probe", action="store_false",
                    help="skip the wedge-probe (child processes: the parent "
                         "already probed; re-probing under load flakes)")
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    if args.probe:
        import bench as bench_mod  # reuse the wedge-safe probe
        try:
            bench_mod.probe_device()
        except Exception as exc:
            print(json.dumps({"error": f"device probe failed: {exc}"}))
            sys.exit(2)

    from igm_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    wanted = [f.strip() for f in args.families.split(",") if f.strip()] \
        or list(SWEEP)
    dev = jax.devices()[0]
    results = {"device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
               "iters": args.iters, "chain": args.chain, "rows": []}
    for fam in wanted:
        try:
            if args.isolate and len(wanted) > 1:
                # one process per family: device-queue state never leaks
                # between measurements (compile cache keeps this cheap)
                import subprocess
                cmd = [sys.executable, __file__, "--families", fam,
                       "--iters", str(args.iters), "--warmup",
                       str(args.warmup), "--chain", str(args.chain),
                       "--no-isolate", "--no-probe"]
                proc = subprocess.run(cmd, capture_output=True, text=True,
                                      timeout=1800)
                line = proc.stdout.strip().splitlines()[-1]
                row = json.loads(line)
                row.setdefault("family", fam)
            else:
                row = bench_family(fam, SWEEP[fam], args.iters, args.warmup,
                                   chain=args.chain)
        except Exception as exc:  # record, keep sweeping
            row = {"family": fam, "error": f"{type(exc).__name__}: {exc}"[:300]}
        results["rows"].append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=1))
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
