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
    for i in range(0, min(args.n, len(imgs)), args.batch):
        real_stats.update(fe(imgs[i:i + args.batch]))

    if args.sampler == "ddim" and hasattr(model, "ddim_sample"):
        sampler = jax.jit(lambda s, r: model.ddim_sample(s, r, args.batch))
    else:
        sampler = jax.jit(lambda s, r: model.sample(s, r, args.batch))
    done = 0
    key = jax.random.PRNGKey(args.seed)
    while done < args.n:
        key, sub = jax.random.split(key)
        fake = sampler(state, sub)
        fake_stats.update(fe(to_uint8(fake)))
        done += args.batch

    fid = frechet_distance(*real_stats.finalize(), *fake_stats.finalize())
    print(json.dumps({"fid": round(fid, 4), "backend": backend,
                      "n_real": real_stats.n, "n_fake": fake_stats.n}))


if __name__ == "__main__":
    main()
