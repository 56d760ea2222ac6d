#!/usr/bin/env python
"""Standalone FID evaluation of a trained checkpoint against the val split.

    python tools/eval_fid.py experiment=ddpm/cifar10 \
        --ckpt logs/runs/ddpm/cifar10/checkpoints [--n 5000] [--batch 64] \
        [--sampler ddim]

Prints one JSON line {"fid": ..., "backend": ..., "n": ...}.  Uses the
Inception backend when IGM_INCEPTION_WEIGHTS is set, otherwise the
documented random-feature backend (ranking-valid, not comparable to
published FIDs).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("overrides", nargs="*")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--n", type=int, default=5000)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--sampler", default="ancestral",
                        choices=["ancestral", "ddim", "default"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--stats-dir", default=str(REPO / "benchmarks/fid_stats"),
                        help="disk cache for real-split feature stats; a "
                             "future Inception-weights drop then needs ONE "
                             "command for the north-star number (pass '' to "
                             "disable)")
    args = parser.parse_args()

    from igm_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import numpy as np
    from igm_tpu.config import compose, instantiate
    from igm_tpu.core.checkpoint import CheckpointManager
    from igm_tpu.callbacks.fid import (FeatureStats, frechet_distance,
                                       get_feature_backend)

    cfg = compose(REPO / "configs", [*args.overrides, "print_config=False"])
    datamodule = instantiate(cfg.datamodule)
    datamodule.prepare_data()
    datamodule.setup()
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    model.steps_per_epoch = 1
    template = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    state = CheckpointManager(args.ckpt).restore(template)

    fe, dim, backend = get_feature_backend()
    real_stats, fake_stats = FeatureStats(dim), FeatureStats(dim)

    def to_uint8(x):
        x = np.asarray(x, np.float32)
        if model.input_normalize:
            x = (x + 1.0) / 2.0
        return (np.clip(x, 0, 1) * 255).astype(np.uint8)

    imgs, _ = datamodule.val_arrays()
    n_real = min(args.n, len(imgs))
    real_src = "computed"
    cache_path = None
    if args.stats_dir:
        # cache key: backend + dataset geometry + count (the stats depend on
        # nothing else); invalidated automatically when the backend changes
        h, w, c = imgs.shape[1:4]
        key = f"{backend}_{type(datamodule).__name__}_{h}x{w}x{c}_n{n_real}"
        cache_path = Path(args.stats_dir) / f"{key}.npz"
    if cache_path is not None and cache_path.exists():
        z = np.load(cache_path)
        real_mu, real_sigma = z["mu"], z["sigma"]
        real_n = int(z["n"])
        real_src = "cached"
    else:
        for i in range(0, n_real, args.batch):
            real_stats.update(fe(imgs[i:i + args.batch]))
        real_mu, real_sigma = real_stats.finalize()
        real_n = real_stats.n
        if cache_path is not None:
            cache_path.parent.mkdir(parents=True, exist_ok=True)
            np.savez(cache_path, mu=real_mu, sigma=real_sigma, n=real_n)

    if args.sampler == "ddim" and hasattr(model, "ddim_sample"):
        sampler = jax.jit(lambda s, r: model.ddim_sample(s, r, args.batch))
    elif args.sampler == "dpm" and hasattr(model, "dpm_sample"):
        sampler = jax.jit(lambda s, r: model.dpm_sample(s, r, args.batch))
    else:
        sampler = jax.jit(lambda s, r: model.sample(s, r, args.batch))
    done = 0
    key = jax.random.PRNGKey(args.seed)
    while done < args.n:
        key, sub = jax.random.split(key)
        fake = sampler(state, sub)
        fake_stats.update(fe(to_uint8(fake)))
        done += args.batch

    fid = frechet_distance(real_mu, real_sigma, *fake_stats.finalize())
    print(json.dumps({"fid": round(fid, 4), "backend": backend,
                      "real_stats": real_src,
                      "n_real": real_n, "n_fake": fake_stats.n}))


if __name__ == "__main__":
    main()
