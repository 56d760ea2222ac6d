#!/usr/bin/env python
"""Autoregressive sampling throughput: MADE / PixelCNN / TAR (samples/sec).

The reference's AR samplers are per-pixel Python loops doing one full
network forward per pixel (`/root/reference/src/models/made.py:107-135`,
`pixelcnn.py:167-195`, `tar.py:128-145`) — hundreds of sequential
dispatches per image batch.  Here each sampler is a single compiled
program (MADE: 784-step lax.scan; PixelCNN: row-causal fast sampler;
TAR: KV-cached token scan), so one dispatch produces the whole batch.

    python benchmarks/bench_ar_sampling.py [--families made,pixelcnn,tar]
                                           [--batch 64] [--iters 5]

Emits one JSON line per family.  Hard fence: device_get of an output
slice (block_until_ready can lie through the remote-TPU tunnel, NOTES.md
round-2 timing trap).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FAMILIES = {
    # family -> (experiment overlay, sequential steps per sample)
    "made":     (["experiment=made/mnist"], 784),
    "pixelcnn": (["experiment=pixelcnn/mnist"], 784),
    "tar":      (["experiment=tar/mnist"], 784),
}


def bench(name: str, overrides: list, steps: int, batch: int,
          iters: int) -> dict:
    import jax

    from igm_tpu.config import compose, instantiate

    cfg = compose(REPO / "configs", [*overrides, "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    model.steps_per_epoch = 391
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))

    if name == "tar":
        sampler = jax.jit(lambda s, r: model.sample(s, r, batch))
    else:
        sampler = jax.jit(lambda s, r: model.sample_images(s, r, batch))

    t0 = time.perf_counter()
    out = sampler(state, jax.random.PRNGKey(1))
    jax.device_get(out.reshape(-1)[:4])  # fence incl. compile
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(iters):
        out = sampler(state, jax.random.PRNGKey(2 + i))
    jax.device_get(out.reshape(-1)[:4])
    dt = time.perf_counter() - t0

    return {
        "metric": f"{name}_mnist_samples_per_sec",
        "value": round(batch * iters / dt, 3),
        "unit": "samples/sec",
        "batch": batch,
        "seq_steps": steps,
        "ms_per_batch": round(1000.0 * dt / iters, 3),
        "compile_s": round(compile_s, 1),
        "device": jax.devices()[0].device_kind,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="made,pixelcnn,tar")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--overrides", default="",
                    help="extra config overrides, comma-separated "
                         "(CPU smoke: model.hidden_dim=32)")
    args = ap.parse_args()
    extra = [o for o in args.overrides.split(",") if o]

    from igm_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor IGM_PLATFORM=cpu (axon re-registers over env)

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    for name in args.families.split(","):
        overrides, steps = FAMILIES[name]
        row = bench(name, overrides + extra, steps, args.batch, args.iters)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
