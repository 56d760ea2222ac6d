#!/usr/bin/env python
"""Sampling/inference throughput (samples/sec/chip).

The reference's hottest inference loop (SURVEY.md §3.4): 1000 sequential
UNet forwards per batch, a Python loop in torch (`src/models/ddpm.py:399`).
Here every chain is one compiled lax.scan; this script measures end-to-end
samples/sec for the CIFAR-10-size configs: DDPM ancestral + DDIM-50,
flow-matching Heun-50, and RealNVP's single inverse conv stack.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH = int(os.environ.get("IGM_BENCH_BATCH", "64"))
ITERS = 3


def bench(sample_fn, state, metric: str, **extra) -> None:
    """Pre-compile (warmup call), then hard-fence ITERS timed calls.

    The fence is ``device_get`` of a computed reduction, NOT
    ``block_until_ready`` — over the axon tunnel the latter can resolve
    before queued work executes (NOTES.md "TIMING TRAP"; unfenced
    short-sampler numbers here read up to 3x too high).

    ``IGM_BENCH_ONLY=<substring>`` re-measures a single family without
    rerunning the whole ladder (the ancestral-1000 row alone is ~10 s of
    chain per fence)."""
    only = os.environ.get("IGM_BENCH_ONLY", "")
    if only and only not in metric:
        return
    import jax
    import jax.numpy as jnp

    def fence(x):
        return float(jax.device_get(jnp.sum(x)))

    fence(sample_fn(state, jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    for i in range(ITERS):
        fence(sample_fn(state, jax.random.PRNGKey(2 + i)))
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": metric,
                      "value": round(BATCH * ITERS / dt, 3),
                      "unit": "samples/sec", "batch": BATCH, **extra}),
          flush=True)


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    from igm_tpu.config import to_node
    from igm_tpu.models.ddpm import DDPM

    dm_cfg = to_node({"width": 32, "height": 32, "channels": 3,
                      "transforms": {"convert": True, "normalize": True}})
    model = DDPM(datamodule=dm_cfg, hidden_dim=64, timesteps=1000,
                 dim_mults=[1, 2, 4])
    model.steps_per_epoch = 391
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))

    bench(jax.jit(lambda s, r: model.sample(s, r, BATCH)), state,
          "ddpm_cifar10_samples_per_sec", timesteps=1000)

    # DDIM-50 (beyond-parity fast sampler, models/ddpm.py ddim_sample)
    bench(jax.jit(lambda s, r: model.ddim_sample(s, r, BATCH, steps=50)),
          state, "ddpm_cifar10_ddim50_samples_per_sec", timesteps=50)

    # DPM-Solver++(2M)-20 (2nd-order multistep; DDIM-50 quality class in
    # 20 evals, models/ddpm.py dpm_sample)
    bench(jax.jit(lambda s, r: model.dpm_sample(s, r, BATCH, steps=20)),
          state, "ddpm_cifar10_dpm20_samples_per_sec", timesteps=20)

    # flow matching: 50-step Heun ODE (100 UNet evals) on the same-size UNet
    from igm_tpu.models.flow_matching import FlowMatching
    fm = FlowMatching(datamodule=dm_cfg, hidden_dim=64, dim_mults=[1, 2, 4],
                      sample_steps=50, sampler="heun")
    fm.steps_per_epoch = 391
    fstate = jax.jit(fm.init_state)(jax.random.PRNGKey(0))
    bench(jax.jit(lambda s, r: fm.sample(s, r, BATCH)), fstate,
          "flow_cifar10_heun50_samples_per_sec", ode_steps=50)

    # EDM: 18-step Karras-grid Heun (35 UNet evals; models/edm.py)
    from igm_tpu.models.edm import EDM
    edm = EDM(datamodule=dm_cfg, hidden_dim=64, dim_mults=[1, 2, 4],
              sample_steps=18)
    edm.steps_per_epoch = 391
    estate = jax.jit(edm.init_state)(jax.random.PRNGKey(0))
    bench(jax.jit(lambda s, r: edm.sample(s, r, BATCH)), estate,
          "edm_cifar10_heun18_samples_per_sec", heun_steps=18)

    # consistency model: 1-step (one denoiser forward) and 2-step
    # multistep refinement (models/consistency.py) — the endpoint of the
    # fast-sampler ladder
    from igm_tpu.models.consistency import ConsistencyModel
    cm = ConsistencyModel(datamodule=dm_cfg, hidden_dim=64,
                          dim_mults=[1, 2, 4], ema_decay=0.0)
    cm.steps_per_epoch = 391
    cstate = jax.jit(cm.init_state)(jax.random.PRNGKey(0))
    bench(jax.jit(lambda s, r: cm.sample(s, r, BATCH)), cstate,
          "consistency_cifar10_2step_samples_per_sec", nfe=2)
    bench(jax.jit(lambda s, r: cm.multistep_sample(s, r, BATCH, steps=1)),
          cstate, "consistency_cifar10_1step_samples_per_sec", nfe=1)

    # score-SDE (VE): stochastic Predictor-Corrector reverse SDE (64
    # predictor + 64 Langevin corrector evals) and the deterministic
    # probability-flow ODE (Heun, 127 evals) — models/score_sde.py
    from igm_tpu.models.score_sde import ScoreSDE
    sde = ScoreSDE(datamodule=dm_cfg, hidden_dim=64, dim_mults=[1, 2, 4],
                   sample_steps=64, corrector_steps=1, ema_decay=0.0)
    sde.steps_per_epoch = 391
    sstate = jax.jit(sde.init_state)(jax.random.PRNGKey(0))
    bench(jax.jit(lambda s, r: sde.pc_sample(s, r, BATCH)), sstate,
          "score_sde_cifar10_pc64_samples_per_sec", nfe=128)
    bench(jax.jit(lambda s, r: sde.ode_sample(s, r, BATCH)), sstate,
          "score_sde_cifar10_ode64_samples_per_sec", nfe=127)
    # VP variant (DDPM's continuous-time limit): same eval counts, the
    # per-step coefficient table rides the scan instead of a sigma grid
    sde_vp = ScoreSDE(datamodule=dm_cfg, hidden_dim=64, dim_mults=[1, 2, 4],
                      sample_steps=64, corrector_steps=1, ema_decay=0.0,
                      sde="vp")
    sde_vp.steps_per_epoch = 391
    vstate = jax.jit(sde_vp.init_state)(jax.random.PRNGKey(0))
    bench(jax.jit(lambda s, r: sde_vp.pc_sample(s, r, BATCH)), vstate,
          "score_sde_vp_cifar10_pc64_samples_per_sec", nfe=128)

    # progressive distillation students: N unclipped DDIM steps on the
    # phase ladder (models/distill.py) — throughput is arch-only, so an
    # untrained student measures the serving cost of the halved sampler
    from igm_tpu.models.distill import ProgressiveDistillation
    for n_steps in (8, 4):
        pd = ProgressiveDistillation(
            datamodule=dm_cfg, hidden_dim=64, dim_mults=[1, 2, 4],
            timesteps=1000, student_steps=n_steps, ema_decay=0.0)
        pd.steps_per_epoch = 391
        pstate = jax.jit(pd.init_state)(jax.random.PRNGKey(0))
        bench(jax.jit(lambda s, r, m=pd: m.student_sample(s, r, BATCH)),
              pstate, f"ddpm_distill{n_steps}_samples_per_sec", nfe=n_steps)

    # realnvp: sampling is ONE inverse conv stack (no chain at all)
    from igm_tpu.models.realnvp import RealNVP
    nvp = RealNVP(datamodule=dm_cfg, hidden_dim=128)
    nvp.steps_per_epoch = 391
    nstate = jax.jit(nvp.init_state)(jax.random.PRNGKey(0))
    bench(jax.jit(lambda s, r: nvp.sample(s, r, BATCH)), nstate,
          "realnvp_cifar10_samples_per_sec")


if __name__ == "__main__":
    main()
