#!/usr/bin/env python
"""AOT-export a trained sampler as a serialized StableHLO serving artifact.

    # export (params baked in -> self-contained artifact)
    python tools/export.py experiment=vae/mnist_mlp --ckpt <dir> \
        --out sampler.jaxexport [--n 64] [--platforms cpu,tpu]

    # diffusion serving with a fast sampler (20 evals, not 1000)
    python tools/export.py experiment=ddpm/cifar10 --ckpt <dir> \
        --sampler dpm --steps 20 --out ddpm.jaxexport

    # serve/run the artifact (no model code, no config needed)
    python tools/export.py --run sampler.jaxexport --seed 3 --out grid.png

The reference has no deployment path at all (sampling only ever runs
inside a Lightning validation callback, `src/callbacks/visualization.py`);
this is the TPU-native serving story: `jax.export` lowers the jitted
sampler once — including cross-platform lowering, so a CPU host can emit
a TPU artifact — and the serialized module runs under any JAX runtime
with zero framework imports.

Artifact layout: `<out>` = serialized Exported bytes;
`<out>.json` = {model, n, platforms, out_shape, key_shape} metadata.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def do_export(args) -> None:
    import jax
    from jax import export as jexport
    from igm_tpu.config import compose, instantiate
    from igm_tpu.core.checkpoint import CheckpointManager

    cfg = compose(REPO / "configs", [*args.overrides, "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    model.steps_per_epoch = 1
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    if args.ckpt:
        state = CheckpointManager(args.ckpt).restore(state)
    else:
        print("WARNING: no --ckpt given - exporting UNTRAINED init params",
              file=sys.stderr)

    n = args.n
    if args.sampler == "default":
        sample_fn = lambda rng: model.sample(state, rng, n)
    else:
        # fast-sampler serving (ddpm-family models): ddim / dpm, with the
        # config's step count unless --steps overrides
        method = getattr(model, f"{args.sampler}_sample", None)
        if method is None:
            raise SystemExit(f"--sampler {args.sampler}: "
                             f"{type(model).__name__} has no "
                             f"{args.sampler}_sample")
        # per-sampler step hparam (ddim_steps/dpm_steps) or the model's
        # generic sample_steps (EDM heun, consistency multistep)
        steps = args.steps or int(
            model.hparams.get(f"{args.sampler}_steps")
            or model.hparams.get("sample_steps"))
        sample_fn = lambda rng: method(state, rng, n, steps=steps)
    fn = jax.jit(sample_fn)
    key = jax.random.PRNGKey(0)
    key_spec = jax.ShapeDtypeStruct(key.shape, key.dtype)
    platforms = [p for p in args.platforms.split(",") if p]
    exported = jexport.export(fn, platforms=platforms)(key_spec)

    out = Path(args.out)
    out.write_bytes(exported.serialize())
    meta = {
        "model": str(cfg.model.get("_target_", "?")),
        "experiment": next((o.split("=", 1)[1] for o in args.overrides
                            if o.startswith("experiment=")), None),
        "n": n,
        "sampler": args.sampler,
        "platforms": platforms,
        "out_shape": [list(s.shape) for s in jax.tree_util.tree_leaves(
            exported.out_avals)][:1] or None,
        "key_shape": list(key.shape),
        "key_dtype": str(key.dtype),
        "step": int(state.step),
    }
    Path(str(out) + ".json").write_text(json.dumps(meta, indent=1))
    print(f"wrote {out} ({out.stat().st_size/1e6:.2f} MB, "
          f"platforms={platforms}, n={n}, trained step {int(state.step)})")


def do_run(args) -> None:
    import jax
    import numpy as np
    from jax import export as jexport

    blob = Path(args.run).read_bytes()
    exported = jexport.deserialize(blob)
    key = jax.random.PRNGKey(args.seed)
    imgs = np.asarray(exported.call(key))
    print(f"ran {args.run}: output {imgs.shape} {imgs.dtype} "
          f"range [{imgs.min():.3f}, {imgs.max():.3f}]")
    if args.out:
        # grid rendering needs the repo only for layout, not the model
        from igm_tpu.callbacks.visualization import make_grid, save_image_grid
        grid = make_grid(imgs, normalize=True)
        if grid.shape[-1] == 1:
            grid = grid[..., 0]
        save_image_grid(grid, args.out)
        print(f"wrote {args.out}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("overrides", nargs="*", help="config overrides")
    parser.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    parser.add_argument("--n", type=int, default=64, help="serving batch")
    parser.add_argument("--sampler", default="default",
                        choices=["default", "ddim", "dpm", "heun",
                                 "multistep", "pc", "ode"],
                        help="export a specific sampler instead of the "
                             "model's default: ddim/dpm (ddpm family), "
                             "heun (EDM/flow), multistep (consistency; "
                             "--steps 1 = single-eval generation), "
                             "pc/ode (score-SDE Predictor-Corrector / "
                             "probability-flow ODE)")
    parser.add_argument("--steps", type=int, default=None,
                        help="fast-sampler step count (default: config)")
    parser.add_argument("--out", default="sampler.jaxexport")
    parser.add_argument("--platforms", default="cpu,tpu",
                        help="lowering targets (comma list)")
    parser.add_argument("--run", default=None,
                        help="path to an artifact to execute instead")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from igm_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    if args.run:
        if args.out == "sampler.jaxexport":
            args.out = None
        do_run(args)
    else:
        do_export(args)


if __name__ == "__main__":
    main()
