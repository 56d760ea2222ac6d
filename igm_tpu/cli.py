"""Console entrypoints (parity: /root/reference/run.py).

``igm-train`` (== ``python run.py``):

    igm-train experiment=ddpm/cifar10 [model.lr=1e-3] [trainer.max_epochs=5]
    igm-train -m experiment=vae/mnist_mlp model.lr=1e-3,5e-4       # grid sweep
    igm-train -m hydra/sweeper=optuna hydra.sweeper.n_trials=20 \
        experiment=vae/mnist_mlp 'model.lr=tag(log, interval(1e-4,1e-2))'

Composes the config tree (Hydra-compatible), chdirs into the per-run log
dir (logs/runs/<exp_name>), then calls igm_tpu.train.train.  Multiruns go
through the sweeper (basic cartesian grid, or the optuna-style TPE study)
and the launcher (sequential, or joblib-style parallel subprocesses —
``configs/config.yaml:18`` parity).

The config tree is found via (first hit wins): ``$IGM_CONFIG_DIR``, then
``./configs`` relative to the CWD, then the repo checkout next to this
package.  ``igm-sample`` is the standalone checkpoint→grid inference CLI.
"""
from __future__ import annotations

import itertools
import os
import sys
from pathlib import Path


def config_dir() -> Path:
    cands = [os.environ.get("IGM_CONFIG_DIR"),
             Path.cwd() / "configs",
             Path(__file__).resolve().parent.parent / "configs"]
    for cand in cands:
        if cand and Path(cand).is_dir():
            return Path(cand)
    raise SystemExit("no configs/ tree found: set IGM_CONFIG_DIR or run "
                     "from a directory containing configs/")


def _single_run(overrides, multirun_subdir=None):
    from igm_tpu.config import compose, select
    from igm_tpu.sweep import write_result
    from igm_tpu.utils.utils import print_config

    cfg = compose(config_dir(), overrides)
    if cfg.get("print_config"):
        print_config(cfg, resolve=True)
    run_dir = None
    try:
        if multirun_subdir is None:
            run_dir = str(select(cfg, "hydra.run.dir"))
        else:
            run_dir = os.path.join(str(select(cfg, "hydra.sweep.dir")),
                                   multirun_subdir)
    except KeyError:
        pass
    cwd = os.getcwd()
    chdir = bool(select(cfg, "hydra.job.chdir", True)) and run_dir
    try:
        if chdir:
            os.makedirs(run_dir, exist_ok=True)
            os.chdir(run_dir)
        from igm_tpu.train import train
        result = train(cfg)
        if result is not None:
            print(f"optimized_metric: {result}")
            # write to the resolved run dir even when hydra.job.chdir=False
            # (if chdir'd, cwd IS the run dir; else run_dir is relative to
            # the unchanged launch cwd)
            out_dir = (Path(os.getcwd()) if chdir or not run_dir
                       else Path(run_dir))
            out_dir.mkdir(parents=True, exist_ok=True)
            write_result(out_dir, result)
        return result
    finally:
        os.chdir(cwd)


def _partition_sweep(overrides):
    """Split CLI tokens into fixed overrides and (key, Dist) sweep dims."""
    from igm_tpu.sweep import parse_override

    fixed, swept = [], []
    for ov in overrides:
        key, dist = parse_override(ov)
        if dist is None:
            fixed.append(ov)
        else:
            swept.append((key, dist))
    return fixed, swept


def _multirun(args) -> None:
    from igm_tpu.config import compose, select

    fixed, swept = _partition_sweep(args)
    cfg = compose(config_dir(), fixed)
    sweeper = select(cfg, "hydra.sweeper", None) or {"_target_": "basic"}
    launcher = select(cfg, "hydra.launcher", None) or {"_target_": "basic"}
    sweep_dir = Path(str(select(cfg, "hydra.sweep.dir", "logs/multiruns")))
    if str(sweeper.get("_target_")) == "optuna":
        _optuna_sweep(fixed, swept, sweeper, launcher, sweep_dir)
    else:
        _grid_sweep(fixed, swept, launcher, sweep_dir)


def _launch(jobs, launcher, sweep_dir):
    from igm_tpu.sweep import launch

    return launch(jobs, launcher, sweep_dir, _worker_argv(),
                  run_inline=lambda job: _single_run(job.overrides,
                                                     multirun_subdir=job.subdir))


def _worker_argv():
    """Argv prefix that re-enters this CLI in a subprocess (joblib launcher).

    Prefer the repo's run.py when it exists (keeps sys.path + env handling
    identical); fall back to ``-m igm_tpu.cli`` for installed packages.
    """
    run_py = Path(__file__).resolve().parent.parent / "run.py"
    if run_py.is_file():
        return run_py
    return [sys.executable, "-m", "igm_tpu.cli"]


def _grid_sweep(fixed, swept, launcher, sweep_dir) -> None:
    from igm_tpu.sweep import Job, format_value

    grids = [[f"{k}={format_value(v)}" for v in d.grid()] for k, d in swept]
    jobs = []
    for i, combo in enumerate(itertools.product(*grids)):
        jobs.append(Job(overrides=fixed + list(combo), subdir=str(i)))
    for i, job in enumerate(jobs):
        print(f"--- multirun job {i}: {job.overrides}")
    results = _launch(jobs, launcher, sweep_dir)
    failed = [j.subdir for j, r in zip(jobs, results) if not r.ok]
    if failed:
        raise SystemExit(f"multirun: {len(failed)}/{len(jobs)} jobs failed "
                         f"(subdirs {', '.join(failed)})")


def _optuna_sweep(fixed, swept, sweeper, launcher, sweep_dir) -> None:
    import json

    from igm_tpu.sweep import Job, Study, dist_from_config, format_value

    space = dict(swept)
    for key, node in dict(sweeper.get("search_space") or {}).items():
        space.setdefault(key, dist_from_config(node))
    if not space:
        raise SystemExit("hydra/sweeper=optuna needs at least one sweep "
                         "dimension, e.g. 'model.lr=interval(1e-4,1e-2)'")
    direction = str(sweeper.get("direction", "minimize"))
    study = Study(space, direction=direction,
                  sampler=str(sweeper.get("sampler", "tpe")),
                  seed=sweeper.get("seed"),
                  n_startup_trials=int(sweeper.get("n_startup_trials", 10)))
    n_trials = int(sweeper.get("n_trials", 20))
    n_jobs = max(1, int(sweeper.get("n_jobs", 1)))

    # resume: replay the journal of finished trials (a killed sweep - e.g.
    # a TPU wedge - restarts with the same command and continues)
    journal = sweep_dir / "trials.jsonl"
    done = 0
    if journal.exists():
        for line in journal.read_text().splitlines():
            rec = json.loads(line)
            study.add_observation(rec["params"], rec.get("value"))
            done += 1
        if done:
            print(f"--- optuna resume: replayed {done} finished trials "
                  f"from {journal}")

    while done < n_trials:
        batch = [study.ask() for _ in range(min(n_jobs, n_trials - done))]
        jobs = [Job(overrides=fixed + [f"{k}={format_value(v)}"
                                       for k, v in t.params.items()],
                    subdir=str(t.number))
                for t in batch]
        for t, job in zip(batch, jobs):
            print(f"--- optuna trial {t.number}: {job.overrides}")
        results = _launch(jobs, launcher, sweep_dir)
        os.makedirs(sweep_dir, exist_ok=True)
        with open(journal, "a") as fh:
            for t, r in zip(batch, results):
                study.tell(t, r.value if r.ok else None)
                print(f"--- optuna trial {t.number} value: "
                      f"{r.value if r.ok else 'FAILED'}")
                fh.write(json.dumps(
                    {"number": t.number, "params": t.params,
                     "value": t.value}) + "\n")
        done += len(batch)
    try:
        best = study.best_trial
    except RuntimeError:
        raise SystemExit(
            "optuna sweep: no trial returned an objective - set "
            "`+optimized_metric=<logged metric>` (e.g. "
            "val_log/log_p_x_of_z) so train() returns a value to optimize")
    print(f"Best value: {best.value} (trial {best.number})")
    print(f"Best params: {best.params}")
    results = {"name": "optuna", "best_value": best.value,
               "best_params": {k: v for k, v in best.params.items()}}
    import yaml
    os.makedirs(sweep_dir, exist_ok=True)
    (sweep_dir / "optimization_results.yaml").write_text(
        yaml.safe_dump(results, sort_keys=False))


def train_main(argv=None) -> None:
    args = list(sys.argv[1:] if argv is None else argv)
    multirun = False
    if args and args[0] in ("-m", "--multirun"):
        multirun = True
        args = args[1:]
    if multirun:
        _multirun(args)
    else:
        _single_run(args)


def sample_main(argv=None) -> None:
    """Checkpoint → sample-grid inference CLI (== tools/sample.py)."""
    import argparse

    parser = argparse.ArgumentParser(prog="igm-sample")
    parser.add_argument("overrides", nargs="*",
                        help="config overrides (experiment=...)")
    parser.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--out", default="samples.png")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--label", type=int, default=None,
                        help="class label (conditional models, e.g. "
                             "ddpm/cond_mnist): draw all n samples from "
                             "this class")
    parser.add_argument("--inpaint", default=None,
                        choices=["left", "right", "top", "bottom", "center"],
                        help="diffusion models: erase this region of n "
                             "validation images and inpaint it (RePaint); "
                             "grid shows masked inputs then results")
    parser.add_argument("--resample", type=int, default=1,
                        help="RePaint resampling passes per step (U)")
    parser.add_argument("--sampler", default=None,
                        choices=["ddim", "dpm", "heun", "multistep"],
                        help="use a specific fast sampler instead of the "
                             "model default (ddim/dpm: ddpm family; heun: "
                             "EDM; multistep: consistency)")
    parser.add_argument("--steps", type=int, default=None,
                        help="fast-sampler step count (default: config)")
    args = parser.parse_args(argv)

    from igm_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import numpy as np
    from igm_tpu.callbacks.visualization import (get_grid_images,
                                                 save_image_grid)
    from igm_tpu.config import compose, instantiate
    from igm_tpu.core.checkpoint import CheckpointManager

    cfg = compose(config_dir(), [*args.overrides, "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    model.steps_per_epoch = 1
    template = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    state = CheckpointManager(args.ckpt).restore(template)

    import jax.numpy as jnp

    kwargs = {}
    if args.label is not None:
        import inspect
        target = model.inpaint if args.inpaint else model.sample
        if "y" not in inspect.signature(target).parameters:
            raise SystemExit(f"--label: {type(model).__name__} is "
                             "not class-conditional")
        kwargs["y"] = jnp.full((args.n,), args.label, jnp.int32)

    if args.inpaint:
        if not hasattr(model, "inpaint"):
            raise SystemExit(f"--inpaint: {type(model).__name__} has no "
                             "inpaint sampler (diffusion models only)")
        dm = instantiate(cfg.datamodule)
        dm.prepare_data()
        dm.setup()
        x0 = model.preprocess(jnp.asarray(dm.val_arrays()[0][:args.n]))
        h, w = x0.shape[1], x0.shape[2]
        mask = np.ones((1, h, w, 1), np.float32)  # 1 = known, 0 = hole
        region = {"left": np.s_[:, :, : w // 2], "right": np.s_[:, :, w // 2:],
                  "top": np.s_[:, : h // 2], "bottom": np.s_[:, h // 2:],
                  "center": np.s_[:, h // 4: 3 * h // 4, w // 4: 3 * w // 4]}
        mask[region[args.inpaint]] = 0.0
        mask = jnp.asarray(mask)
        painted = jax.jit(lambda r: model.inpaint(
            state, r, x0, mask, resample=args.resample, **kwargs))(
                jax.random.PRNGKey(args.seed))
        masked = mask * x0  # holes render mid-gray in [-1,1] space
        imgs = jnp.concatenate([masked, painted])
        n_show = 2 * args.n
    elif args.sampler:
        method = getattr(model, f"{args.sampler}_sample", None)
        if method is None:
            raise SystemExit(f"--sampler {args.sampler}: "
                             f"{type(model).__name__} has no "
                             f"{args.sampler}_sample")
        steps = args.steps or int(
            model.hparams.get(f"{args.sampler}_steps")
            or model.hparams.get("sample_steps"))
        imgs = jnp.clip(method(state, jax.random.PRNGKey(args.seed),
                               args.n, steps=steps, **kwargs), -1.0, 1.0)
        n_show = args.n
    else:
        imgs = model.sample(state, jax.random.PRNGKey(args.seed), args.n,
                            **kwargs)
        n_show = args.n
    grid = get_grid_images(np.asarray(imgs), model, nimgs=n_show)
    save_image_grid(grid, args.out)
    print(f"wrote {args.out} ({n_show} images, step {int(state.step)})")


if __name__ == "__main__":  # python -m igm_tpu.cli == igm-train
    train_main()
