#!/usr/bin/env python
"""Generate a sample grid from a trained checkpoint (inference CLI).

    python tools/sample.py experiment=vae/mnist_mlp \
        --ckpt logs/runs/vae/mnist_mlp/checkpoints [--n 64] [--out grid.png]

Composes the experiment config, restores the orbax checkpoint, runs the
model's (jitted) sampler, and writes a grid image — the standalone
inference path the reference never had (its sampling only ran inside
Lightning validation).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("overrides", nargs="*", help="config overrides (experiment=...)")
    parser.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--out", default="samples.png")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--label", type=int, default=None,
                        help="class label (conditional models, e.g. "
                             "ddpm/cond_mnist): draw all n samples from "
                             "this class")
    args = parser.parse_args()

    from igm_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import numpy as np
    from igm_tpu.config import compose, instantiate
    from igm_tpu.core.checkpoint import CheckpointManager
    from igm_tpu.callbacks.visualization import get_grid_images, save_image_grid

    cfg = compose(REPO / "configs", [*args.overrides, "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    model.steps_per_epoch = 1
    template = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    state = CheckpointManager(args.ckpt).restore(template)

    kwargs = {}
    if args.label is not None:
        import inspect
        import jax.numpy as jnp
        if "y" not in inspect.signature(model.sample).parameters:
            raise SystemExit(f"--label: {type(model).__name__}.sample is "
                             "not class-conditional")
        kwargs["y"] = jnp.full((args.n,), args.label, jnp.int32)
    imgs = model.sample(state, jax.random.PRNGKey(args.seed), args.n, **kwargs)
    grid = get_grid_images(np.asarray(imgs), model, nimgs=args.n)
    save_image_grid(grid, args.out)
    print(f"wrote {args.out} ({args.n} samples, step {int(state.step)})")


if __name__ == "__main__":
    main()
