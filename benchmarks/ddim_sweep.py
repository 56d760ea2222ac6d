#!/usr/bin/env python
"""Root-cause sweep for the round-4 DDIM-50 quality anomaly (VERDICT #3).

On ONE set of trained DDPM weights, scores every cell of
  {clip mode: consistent | stale-eps | none} x {steps: 50,100,250} x
  {eta: 0.0, 0.5, 1.0}
plus a DPM-20 reference row, with the offline digit classifier
(igm_tpu/utils/digit_score.py) at the checkpoint's geometry.

"stale-eps" reimplements the pre-round-5 ddim_sample behavior (x0 clipped
but the direction term built from the UNCLIPPED eps — the inconsistent
pair models/ddpm.py now repairs by re-deriving eps after the clip); it is
kept here, not in the model, purely as the measurement arm.

    python benchmarks/ddim_sweep.py --ckpt <orbax dir> \
        [--experiment ddpm/cifar10] [--n 64] [--seed 11] \
        [--out benchmarks/ddim_sweep_round5.json]

Writes one JSON with a row per arm; the sampler it interrogates is the
fast-inference path the reference never had (its only sampler is the
1000-step ancestral loop, /root/reference/src/models/ddpm.py:399-409).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os  # noqa: E402

os.environ.setdefault("IGM_CONFIG_DIR", str(REPO / "configs"))

from igm_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def stale_eps_ddim(model, state, rng, n, steps, eta):
    """The pre-fix chain: clip x0 but keep the pre-clip eps for dir_xt."""
    shape = model._sample_shape(n)
    init_rng, chain_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape)
    seq = jnp.linspace(0, model.timesteps - 1,
                       steps).round().astype(jnp.int32)
    seq_prev = jnp.concatenate([jnp.array([-1], jnp.int32), seq[:-1]])
    tbl = model.tables

    def step(carry, ts):
        x, key = carry
        t, t_prev = ts
        key, sub = jax.random.split(key)
        tb = jnp.full((n,), t, jnp.int32)
        eps = model._eps(state, x, tb.astype(jnp.float32))
        a_t = tbl.alphas_cumprod[t]
        a_prev = jnp.where(t_prev >= 0, tbl.alphas_cumprod[t_prev], 1.0)
        x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        x0 = jnp.clip(x0, -1.0, 1.0)
        sigma = (eta * jnp.sqrt((1 - a_prev) / (1 - a_t))
                 * jnp.sqrt(1 - a_t / a_prev))
        dir_xt = jnp.sqrt(jnp.maximum(1 - a_prev - sigma ** 2, 0.0)) * eps
        noise = jax.random.normal(sub, shape)
        x = (jnp.sqrt(a_prev) * x0 + dir_xt
             + jnp.where(t_prev >= 0, sigma, 0.0) * noise)
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, chain_rng),
                             (seq[::-1], seq_prev[::-1]))
    return x


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--experiment", default="ddpm/cifar10")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--out",
                    default=str(REPO / "benchmarks/ddim_sweep_round5.json"))
    ap.add_argument("--grids-dir", default=None,
                    help="also save sample grids for the steps=50 arms")
    args = ap.parse_args()

    from igm_tpu.config import compose, instantiate
    from igm_tpu.core.checkpoint import CheckpointManager
    from igm_tpu.utils.digit_score import load_or_train, score_samples

    cfg = compose(os.environ["IGM_CONFIG_DIR"],
                  [f"experiment={args.experiment}", "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    model.steps_per_epoch = 1
    template = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    state = CheckpointManager(args.ckpt).restore(template)
    h, w = int(cfg.datamodule.height), int(cfg.datamodule.width)
    scorer = load_or_train(str(REPO / "data"), h, w)

    rng = jax.random.PRNGKey(args.seed)
    rows = []

    def record(name, imgs, **meta):
        imgs = np.asarray(jnp.clip(imgs, -1.0, 1.0))
        s = score_samples(scorer, imgs)
        row = {"arm": name, **meta, **s}
        rows.append(row)
        print(json.dumps(row))
        if args.grids_dir and meta.get("steps") in (None, 50):
            from igm_tpu.callbacks.visualization import (get_grid_images,
                                                         save_image_grid)
            Path(args.grids_dir).mkdir(parents=True, exist_ok=True)
            save_image_grid(get_grid_images(imgs, model, nimgs=len(imgs)),
                            str(Path(args.grids_dir) / f"{name}.jpg"))

    for steps in (50, 100, 250):
        for eta in (0.0, 0.5, 1.0):
            record(f"ddim{steps}_eta{eta}_consistent",
                   model.ddim_sample(state, rng, args.n, steps=steps,
                                     eta=eta, clip_denoised=True),
                   sampler="ddim", steps=steps, eta=eta, clip="consistent")
            record(f"ddim{steps}_eta{eta}_stale",
                   stale_eps_ddim(model, state, rng, args.n, steps, eta),
                   sampler="ddim", steps=steps, eta=eta, clip="stale")
        record(f"ddim{steps}_eta0.0_noclip",
               model.ddim_sample(state, rng, args.n, steps=steps,
                                 eta=0.0, clip_denoised=False),
               sampler="ddim", steps=steps, eta=0.0, clip="none")

    record("dpm20", model.dpm_sample(state, rng, args.n, steps=20),
           sampler="dpm", steps=20)

    out = {"experiment": args.experiment, "ckpt": args.ckpt,
           "step": int(state.step), "n": args.n, "seed": args.seed,
           "rows": rows}
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
