#!/usr/bin/env python
"""DiT attention path A/B on-chip: XLA einsum softmax vs Pallas flash.

The dit_768x12 profile trace (benchmarks/profiles/dit_trace.json) shows the
XLA attention at ~52% of step time for ~5% of FLOPs — the f32 logits
(805 MB) + bf16 probs (403 MB) tensors round-trip HBM every block, fwd and
bwd.  The flash kernel keeps them in VMEM.  This script measures, per arm:

  - forward-output agreement (max |diff|) on one batch (correctness), and
  - hard-fenced train-step steps/s (NOTES.md timing rules: device_get of a
    computed param leaf, everything pre-compiled before the timed window).

    python benchmarks/bench_dit_attn.py [--iters 20] [--batch 256]
                                        [--width 768 --depth 12 --heads 12]
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--heads", type=int, default=12)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    import numpy as np

    from igm_tpu.config import to_node
    from igm_tpu.models.ddpm import DDPM
    from igm_tpu.utils.platform import apply_platform_env, apply_prng_env

    apply_platform_env()
    apply_prng_env()

    dm_cfg = to_node({"width": 32, "height": 32, "channels": 3,
                      "transforms": {"convert": True, "normalize": True}})
    rng = np.random.default_rng(0)
    batch = (rng.integers(0, 255, (args.batch, 32, 32, 3), dtype=np.uint8),
             rng.integers(0, 10, (args.batch,)).astype(np.int32))
    x_eval = jax.numpy.asarray(
        rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    t_eval = jax.numpy.asarray(
        rng.integers(0, 1000, (8,)).astype(np.float32))

    results = {}
    fwd_outs = {}
    for attn in ("xla", "remat", "flash"):
        model = DDPM(datamodule=dm_cfg, hidden_dim=args.width,
                     timesteps=1000, network="dit", depth=args.depth,
                     heads=args.heads, patch=2, loss_type="l1", lr=1e-4,
                     b1=0.9, b2=0.999, attention=attn)
        model.steps_per_epoch = 391
        state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
        # adaLN-Zero makes the INIT output exactly 0 (both arms would
        # trivially agree): perturb every param deterministically so the
        # correctness check exercises real attention outputs
        def _perturb(params):
            leaves, treedef = jax.tree_util.tree_flatten(params)
            keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
            out = [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                   for l, k in zip(leaves, keys)]
            return jax.tree_util.tree_unflatten(treedef, out)
        state = state.replace(params=jax.jit(_perturb)(state.params))

        def fwd(st, x, t):
            out, _ = model.modules.apply("denoise", st.params, st.mutables,
                                         x, t, train=False)
            return out
        fwd_outs[attn] = np.asarray(jax.jit(fwd)(state, x_eval, t_eval),
                                    np.float32)

        step = jax.jit(model.train_step, donate_argnums=0)

        def fence(st):
            return jax.device_get(
                jax.tree_util.tree_leaves(st.params)[0])

        for _ in range(3):  # warmup compiles the step AND the fence path
            state, _ = step(state, batch)
        fence(state)

        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, _ = step(state, batch)
        fence(state)
        dt = (time.perf_counter() - t0) / args.iters
        results[attn] = {"ms_per_step": dt * 1e3,
                         "steps_per_sec": 1.0 / dt,
                         "imgs_per_sec": args.batch / dt}
        del state, step

    scale = float(np.max(np.abs(fwd_outs["xla"])) or 1.0)
    diffs = {f"fwd_max_abs_diff_{k}": float(
                 np.max(np.abs(fwd_outs["xla"] - fwd_outs[k])))
             for k in fwd_outs if k != "xla"}
    out = {"config": vars(args), "fwd_max_abs": scale, **diffs, **results}
    out["speedups_over_xla"] = {
        k: results["xla"]["ms_per_step"] / results[k]["ms_per_step"]
        for k in results if k != "xla"}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
