#!/usr/bin/env python
"""Headline benchmark: DDPM CIFAR-10 training-step throughput (imgs/sec).

Runs the flagship config's exact training step (UNet dim=64, mults [1,2,4],
1000-timestep cosine schedule, l1 eps-loss, Adam) on random CIFAR-shaped
uint8 data, jitted with donated state on the default device (TPU under the
driver).  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "imgs/sec", "vs_baseline": R,
     "flops_per_step": F, "mfu": M, "device": ..., ...}

Baseline: the reference (PyTorch-Lightning, `src/models/ddpm.py`) publishes
no numbers (SURVEY.md §6).  BASELINE_IMGS_PER_SEC below is our recorded
estimate of the reference's single-V100 throughput for this exact UNet/batch
(fp32 torch, batch 128, ~0.7s/step ≈ 180 imgs/s) — the best available
stand-in until a measured reference number exists; vs_baseline is
value / BASELINE_IMGS_PER_SEC.  See benchmarks/BASELINE_DERIVATION.md for
the step-time derivation behind the estimate.

Wedge resilience (round-1 incident, NOTES.md): the axon TPU tunnel can be
left unusable by a previously killed client — backend init then either
raises UNAVAILABLE or hangs forever.  So before touching the device in this
process, we probe it in a SUBPROCESS with a hard timeout, retry once after a
cooldown, and on persistent failure print a diagnostic JSON line (metric +
"error") instead of dying with a raw traceback.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

BASELINE_IMGS_PER_SEC = 180.0
BATCH = int(os.environ.get("IGM_BENCH_BATCH", "256"))
WARMUP = 3
ITERS = int(os.environ.get("IGM_BENCH_ITERS", "20"))
# First DDPM compile through the axon tunnel can take ~5-8 min (NOTES.md);
# probe timeout must cover a cold compile of the probe's tiny matmul only.
PROBE_TIMEOUT_S = int(os.environ.get("IGM_BENCH_PROBE_TIMEOUT", "240"))
PROBE_COOLDOWN_S = int(os.environ.get("IGM_BENCH_PROBE_COOLDOWN", "60"))

_PROBE_SRC = r"""
import os, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
if os.environ.get("IGM_PLATFORM"):  # axon plugin overrides plain env vars
    jax.config.update("jax_platforms", os.environ["IGM_PLATFORM"])
import jax.numpy as jnp
d = jax.devices()[0]
out = float(jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128), jnp.bfloat16)))
print(json.dumps({"platform": d.platform, "kind": getattr(d, "device_kind", "?"),
                  "ok": out == 128.0 ** 3}))  # each of 128^2 entries is 128
"""

# bf16 peak FLOP/s per chip by device kind (public figures); used for MFU.
_PEAK_FLOPS = {
    "v4": 275e12,
    "v5 lite": 197e12, "v5e": 197e12, "v5litepod": 197e12,
    "v5p": 459e12, "v5": 459e12,
    "v6e": 918e12, "trillium": 918e12,
    "cpu": 1e12,  # nominal, so MFU stays defined in CPU smoke runs
}


def _peak_flops(device_kind: str, platform: str) -> float:
    kind = device_kind.lower()
    for key, val in _PEAK_FLOPS.items():
        if key in kind:
            return val
    return _PEAK_FLOPS.get(platform.lower(), 197e12)


def probe_device() -> dict:
    """Run the tiny-probe in a subprocess; returns its JSON or raises."""
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE_SRC], capture_output=True, text=True,
        timeout=PROBE_TIMEOUT_S)
    if proc.returncode != 0:
        raise RuntimeError(f"probe rc={proc.returncode}: "
                           f"{proc.stderr.strip()[-400:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    probe_err = ""
    for attempt in range(2):
        try:
            info = probe_device()
            break
        except Exception as exc:  # UNAVAILABLE, timeout (hung tunnel), ...
            probe_err = f"attempt {attempt + 1}: {type(exc).__name__}: {exc}"
            sys.stderr.write(f"[bench] device probe failed — {probe_err}\n")
            if attempt == 0:
                time.sleep(PROBE_COOLDOWN_S)
    else:
        # Device unusable.  One diagnostic JSON line, non-crash exit.
        print(json.dumps({
            "metric": "ddpm_cifar10_train_imgs_per_sec",
            "value": None, "unit": "imgs/sec", "vs_baseline": None,
            "error": f"TPU backend unavailable after retry ({probe_err}); "
                     "see NOTES.md round-1 tunnel-wedge incident",
        }))
        sys.exit(2)

    import jax

    from igm_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # IGM_PLATFORM=cpu for off-TPU smoke runs
    import numpy as np

    # persistent compile cache: repeat bench invocations skip the ~minutes
    # XLA compile of the UNet train step
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from igm_tpu.config import to_node
    from igm_tpu.models.ddpm import DDPM
    from igm_tpu.parallel import mesh as mesh_lib

    dm_cfg = to_node({
        "width": 32, "height": 32, "channels": 3,
        "transforms": {"convert": True, "normalize": True},
    })

    def measure(model, metric: str, iters: int, step_s_guess: float) -> dict:
        """Chained, hard-fenced train-step throughput for one model."""
        model.steps_per_epoch = 391  # 50000 / 128, matches the real config
        mesh = mesh_lib.make_mesh()
        state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
        state = mesh_lib.replicate(mesh, state)

        rng = np.random.default_rng(0)
        batch = (rng.integers(0, 255, (BATCH, 32, 32, 3), dtype=np.uint8),
                 np.zeros((BATCH,), np.int32))

        # Chained execution mirrors what a real training run now does:
        # trainer.steps_per_execution=auto applies the resolve_chain_k
        # policy (dispatch overhead <= 2% of covered work).
        # IGM_BENCH_CHAIN=1 restores single-dispatch.
        if jax.default_backend() == "tpu":
            from igm_tpu.core.trainer import Trainer
            default_chain = str(Trainer.resolve_chain_k(step_s_guess, 391))
        else:
            default_chain = "1"
        chain = int(os.environ.get("IGM_BENCH_CHAIN", default_chain))
        if chain > 1:
            step = jax.jit(model.train_step_n, donate_argnums=0)
            chunk = tuple(np.stack([a] * chain) for a in batch)
            dev_batch = jax.tree_util.tree_map(
                lambda x: jax.device_put(np.asarray(x),
                                         mesh_lib.chunk_batch_sharding(mesh)),
                chunk)
        else:
            step = jax.jit(model.train_step, donate_argnums=0)
            dev_batch = mesh_lib.shard_batch(mesh, batch)

        # FLOPs/step from XLA's own cost analysis of the lowered program.
        flops_per_step = None
        try:
            compiled = step.lower(state, dev_batch).compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops_per_step = float(cost.get("flops", 0.0)) or None
        except Exception as exc:
            sys.stderr.write(f"[bench] cost analysis unavailable: {exc}\n")

        # HARD completion fence: device_get of a param leaf.
        # block_until_ready over the axon tunnel can return before
        # donated-state work has executed; a host transfer of a computed
        # leaf cannot.
        def fence(st):
            return jax.device_get(jax.tree_util.tree_leaves(st.params)[0])

        for _ in range(WARMUP):
            state, metrics = step(state, dev_batch)
        fence(state)

        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, dev_batch)
        fence(state)
        dt = time.perf_counter() - t0

        n_steps = iters * max(chain, 1)  # CHAIN train steps per dispatch
        imgs_per_sec = BATCH * n_steps / dt
        dev = jax.devices()[0]
        out = {
            "metric": metric,
            "value": round(imgs_per_sec, 2),
            "unit": "imgs/sec",
            "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
            "batch": BATCH,
            "chain": chain,
            "steps_per_sec": round(n_steps / dt, 3),
            "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
            # provenance: the denominator is a DOCUMENTED ESTIMATE of the
            # reference's V100 throughput, not a measured number (the
            # reference publishes none) — benchmarks/BASELINE_DERIVATION.md
            "baseline": "derived-estimate",
            "baseline_imgs_per_sec": BASELINE_IMGS_PER_SEC,
            "baseline_doc": "benchmarks/BASELINE_DERIVATION.md",
        }
        if flops_per_step:
            # XLA cost analysis counts a lax.scan body ONCE, so the chained
            # program's flops are already per-STEP (tests/test_chained.py)
            peak = _peak_flops(getattr(dev, "device_kind", ""), dev.platform)
            achieved = flops_per_step * n_steps / dt
            out["flops_per_step"] = round(flops_per_step / 1e9, 2)  # GFLOPs
            out["achieved_tflops"] = round(achieved / 1e12, 2)
            out["mfu"] = round(achieved / peak, 4)
        return out

    # Secondary headline: DiT-1024 backbone — the best-MFU model in the
    # repo (transformer GEMMs clear the conv UNet's ~41% architectural
    # ceiling; MFU 0.548 measured round 4, benchmarks/dit_round4.jsonl).
    # Printed FIRST so the LAST line stays the flagship the driver parses.
    # IGM_BENCH_DIT=0 skips it (CPU smoke runs skip it automatically).
    if os.environ.get("IGM_BENCH_DIT", "1") == "1" \
            and jax.default_backend() == "tpu":
        dit = DDPM(datamodule=dm_cfg, hidden_dim=1024, timesteps=1000,
                   network="dit", depth=12, heads=16, patch=2,
                   loss_type="l1", lr=1e-4, b1=0.9, b2=0.999,
                   compute_dtype=os.environ.get("IGM_BENCH_DTYPE", "auto"))
        try:
            print(json.dumps(measure(
                dit, "ddpm_cifar10_dit1024_train_imgs_per_sec",
                iters=max(ITERS // 4, 3), step_s_guess=0.65)), flush=True)
        except Exception as exc:
            sys.stderr.write(f"[bench] DiT leg failed: {exc}\n")

    model = DDPM(datamodule=dm_cfg, hidden_dim=64, timesteps=1000,
                 dim_mults=[1, 2, 4], loss_type="l1", lr=1e-4, b1=0.9,
                 b2=0.999,
                 compute_dtype=os.environ.get("IGM_BENCH_DTYPE", "auto"))
    print(json.dumps(measure(
        model, "ddpm_cifar10_train_imgs_per_sec", iters=ITERS,
        step_s_guess=0.021)))


if __name__ == "__main__":
    main()
