#!/usr/bin/env python
"""Score a class-conditional generator: does asking for class y produce y?

    python tools/score_conditional.py experiment=ddpm/cond_mnist \
        --ckpt <orbax dir> [--per-class 16] [--guidance 2.0] [--out scores.json]

Samples ``per_class`` images for every class with the model's conditional
sampler, classifies them with the deterministic offline digit classifier
(igm_tpu/utils/digit_score.py — the same IS-analog backend the adversarial
real-data gates use), and reports conditional accuracy (classifier argmax
== requested label), per-class accuracy, and mean confidence.  This is the
quantitative payoff of classifier-free guidance: the unconditional DDPM
has coverage/IS numbers only; the conditional model is additionally
label-FAITHFUL or it isn't.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("overrides", nargs="*")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--per-class", type=int, default=16)
    ap.add_argument("--guidance", type=float, default=None,
                    help="override the config's guidance_scale")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="write JSON here too")
    args = ap.parse_args()

    from igm_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from igm_tpu.config import compose, instantiate
    from igm_tpu.core.checkpoint import CheckpointManager
    from igm_tpu.utils import digit_score

    cfg = compose(REPO / "configs", [*args.overrides, "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    model.steps_per_epoch = 1
    if not getattr(model, "num_classes", 0):
        raise SystemExit(f"{type(model).__name__} is not class-conditional")
    template = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    state = CheckpointManager(args.ckpt).restore(template)

    n_cls = model.num_classes
    k = int(args.per_class)
    y = jnp.repeat(jnp.arange(n_cls), k).astype(jnp.int32)
    guidance = (float(args.guidance) if args.guidance is not None
                else float(model.hparams.guidance_scale))

    if hasattr(model, "p_sample_loop"):        # ddpm family (ancestral)
        def sampler(st, rng):
            return model.p_sample_loop(
                st, rng, model._sample_shape(n_cls * k), y=y,
                guidance=guidance)
    elif hasattr(model, "ode_sample"):          # flow matching (Heun ODE)
        def sampler(st, rng):
            return model.ode_sample(st, rng, n_cls * k, y=y,
                                    guidance=guidance)
    else:
        raise SystemExit(f"{type(model).__name__} has no guidance-aware "
                         "sampler (p_sample_loop / ode_sample)")
    imgs = jax.jit(sampler)(state, jax.random.PRNGKey(args.seed))
    if hasattr(model, "decode") and imgs.shape[1:3] != (model.height,
                                                        model.width):
        imgs = jax.jit(model.decode)(state, imgs)
    imgs = np.clip(np.asarray(jax.device_get(imgs)), -1.0, 1.0)

    clf = digit_score.load_or_train(str(REPO / "data"),
                                    model.height, model.width)
    x = imgs.mean(axis=-1, keepdims=True) if imgs.shape[-1] > 1 else imgs
    probs = np.asarray(jax.nn.softmax(
        jax.jit(digit_score.DigitCNN().apply)(clf, jnp.asarray(x)), -1))
    pred = probs.argmax(-1)
    want = np.asarray(y)
    acc = float((pred == want).mean())
    per_class = {int(c): float((pred[want == c] == c).mean())
                 for c in range(n_cls)}
    scores = {
        "experiment": next((o.split("=", 1)[1] for o in args.overrides
                            if o.startswith("experiment=")), None),
        "guidance": guidance,
        "per_class_n": k,
        "conditional_accuracy": acc,
        "per_class_accuracy": per_class,
        "mean_confidence": float(probs.max(-1).mean()),
        "step": int(state.step),
    }
    line = json.dumps(scores)
    print(line)
    if args.out:
        Path(args.out).write_text(line)


if __name__ == "__main__":
    main()
