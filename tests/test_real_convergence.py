"""Convergence thresholds on REAL data (VERDICT item 8).

Round 1's convergence tests were monotonicity tripwires on synthetic noise;
these assert absolute metric thresholds after a fixed budget on the real
digit datasets in data/ (tools/make_real_datasets.py — genuine handwritten
scans through the real parsers; synthetic fallback disabled).

Thresholds are calibrated from archived runs in benchmarks/real_runs/
(e.g. VAE: val log p(x|z) hit -776 by epoch 3 and -745 by epoch 30 on this
exact dataset) with ~3x headroom against seed noise.
"""
import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.config import compose  # noqa: E402
from igm_tpu.train import train  # noqa: E402

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow  # real multi-epoch training runs


def _train_real(config_dir, tmp_path, experiment, epochs, extra=()):
    overrides = [
        f"experiment={experiment}",
        f"data_dir={REPO / 'data'}",
        f"trainer.max_epochs={epochs}",
        "trainer.enable_checkpointing=False",
        "trainer.log_every_n_steps=1",
        "print_config=False",
        "seed=7",
        *extra,
    ]
    cfg = compose(config_dir, overrides)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    os.environ["IGM_SYNTHETIC_DATA"] = "0"
    try:
        train(cfg)
        from igm_tpu.core import trainer as trainer_mod  # for inspection
        return cfg
    finally:
        os.environ["IGM_SYNTHETIC_DATA"] = "1"
        os.chdir(cwd)


def _final_scalar(tmp_path, tag):
    import glob
    import struct
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    vals = []
    for d in glob.glob(str(tmp_path / "**" / "events*"), recursive=True):
        ea = EventAccumulator(str(Path(d).parent))
        ea.Reload()
        if tag in ea.Tags()["scalars"]:
            vals += [(s.step, float(s.value)) for s in ea.Scalars(tag)]
    assert vals, f"tag {tag} never logged"
    return sorted(vals)[-1][1]


def test_vae_real_mnist_elbo_threshold(config_dir, tmp_path):
    """VAE must reach val log p(x|z) > -800 within 6 epochs on real digits
    (archived run: -776 at epoch 3; untrained: ~-900)."""
    _train_real(config_dir, tmp_path, "vae/mnist_mlp", epochs=6)
    final = _final_scalar(tmp_path, "val_log/log_p_x_of_z")
    assert final > -800.0, final


def test_made_real_mnist_bpd_threshold(config_dir, tmp_path):
    """Autoregressive density on real digits: untrained 256-way softmax is
    8 bpd exactly; after 4 epochs MADE must be under 5 bpd (archived runs
    reach ~3; the digit scans have large constant-black regions)."""
    _train_real(config_dir, tmp_path, "made/mnist", epochs=4,
                extra=["model.hidden_dim=256"])
    final = _final_scalar(tmp_path, "val_bpd")
    assert final < 5.0, final


def test_ddpm_real_mnist_loss_threshold(config_dir, tmp_path):
    """Diffusion on real digits: untrained eps-prediction MSE is ~1.0-1.3;
    the archived 30-epoch TPU run (benchmarks/real_ddpm_tb) fell 0.85 ->
    0.14.  A narrow UNet reaches 0.63 after ONE epoch at this size
    (calibration run 2026-08-17); assert < 0.8 after two.  CPU cost is
    compile-dominated (~7 min compile + ~2 min/epoch on the 1-core host)."""
    _train_real(config_dir, tmp_path, "ddpm/mnist", epochs=2,
                extra=["model.hidden_dim=16", "datamodule.batch_size=32",
                       "trainer.check_val_every_n_epoch=10",
                       "trainer.num_sanity_val_steps=0",
                       "trainer.enable_checkpointing=False"])
    final = _final_scalar(tmp_path, "train_loss/loss")
    assert final < 0.8, final


def test_flow_matching_real_mnist_loss_threshold(config_dir, tmp_path):
    """Flow matching on real digits: untrained velocity-MSE is ~1.5 (the
    target x1-x0 has variance ~2 around a zero net); the archived 30-epoch
    TPU run (benchmarks/real_runs/flow_mnist) fell 1.49 -> 0.54 by epoch 4;
    assert < 0.9 after two epochs at a narrow width."""
    _train_real(config_dir, tmp_path, "flow/mnist", epochs=2,
                extra=["model.hidden_dim=16", "datamodule.batch_size=32",
                       "trainer.check_val_every_n_epoch=10",
                       "trainer.num_sanity_val_steps=0"])
    final = _final_scalar(tmp_path, "train_loss/loss")
    assert final < 0.9, final


def test_realnvp_real_mnist_bpd_threshold(config_dir, tmp_path):
    """Exact-likelihood flow on real digits: init bpd ~7.6 (closed-form
    logit-normal, tests/test_realnvp.py); the archived 25-epoch TPU run
    (benchmarks/real_runs/realnvp_mnist) reached train_bpd 5.04 by epoch 4
    and val_bpd 2.97 at the end; assert train_bpd < 6.2 after 3 epochs."""
    _train_real(config_dir, tmp_path, "realnvp/mnist", epochs=3,
                extra=["model.hidden_dim=32", "datamodule.batch_size=32",
                       "trainer.check_val_every_n_epoch=10",
                       "trainer.num_sanity_val_steps=0"])
    final = _final_scalar(tmp_path, "train_bpd")
    assert final < 6.2, final


def test_gan_real_mnist_both_losses_finite(config_dir, tmp_path):
    """Adversarial training on real digits: both G and D losses logged,
    finite, and D-loss departs from its untrained value (learning signal
    flows through both optimizers)."""
    import math
    _train_real(config_dir, tmp_path, "vanilla_gan/mnist_mlp", epochs=4)
    g = _final_scalar(tmp_path, "train_loss/g_loss")
    d = _final_scalar(tmp_path, "train_loss/d_loss")
    assert math.isfinite(g) and math.isfinite(d)
    # untrained D on +-1-normalized data starts at ln(2)~0.693; after 44
    # steps it must have moved (any direction — adversarial, not monotone)
    assert abs(d - 0.693) > 0.02, d


def _sample_from_ckpt(config_dir, tmp_path, experiment, n=256):
    import glob

    import jax
    import numpy as np

    from igm_tpu.config import instantiate
    from igm_tpu.core.checkpoint import CheckpointManager

    cfg = compose(config_dir, [f"experiment={experiment}",
                               f"data_dir={REPO / 'data'}",
                               "print_config=False"])
    model = instantiate(cfg.model, datamodule=cfg.datamodule)
    model.steps_per_epoch = 1
    template = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    # train(cfg) runs in CWD (run.py does the hydra-style per-run chdir)
    candidates = (glob.glob(str(tmp_path / "checkpoints"))
                  + glob.glob(str(tmp_path / "logs/runs/*/*/checkpoints")))
    ckpt = candidates[0]
    state = CheckpointManager(ckpt).restore(template)
    return np.asarray(model.sample(state, jax.random.PRNGKey(0), n))


@pytest.mark.parametrize("experiment,min_cov,min_is,min_conf", [
    # thresholds calibrated from 40-epoch seed-7 runs on the packaged real
    # scans with headroom (measured: gan cov5/IS1.38/conf0.84,
    # lsgan cov3/IS1.35/conf0.66, wgan_gp cov8/IS4.48/conf0.81); an
    # UNTRAINED generator scores cov<=1, IS<=1.07 on every family
    ("vanilla_gan/mnist_mlp", 3, 1.15, 0.6),
    ("lsgan/mlp_mnist", 2, 1.10, 0.5),
    ("wgan_gp/mnist_mlp", 4, 1.80, 0.6),
])
def test_adversarial_sample_quality_gate(config_dir, tmp_path, experiment,
                                         min_cov, min_is, min_conf):
    """Offline sample-quality gate for adversarial families (VERDICT r2
    next-round #4): a deterministic digit classifier trained on the SAME
    real scans scores generated samples; class coverage + digit-IS +
    confidence must clear calibrated thresholds — 'losses finite' is no
    longer the bar."""
    from igm_tpu.utils.digit_score import load_or_train, score_samples

    _train_real(config_dir, tmp_path, experiment, epochs=40,
                extra=["trainer.enable_checkpointing=True"])
    imgs = _sample_from_ckpt(config_dir, tmp_path, experiment)
    params = load_or_train(str(REPO / "data"), 28, 28)
    s = score_samples(params, imgs)
    assert s["coverage"] >= min_cov, s
    assert s["inception_score"] >= min_is, s
    assert s["mean_confidence"] >= min_conf, s


def test_gallery_scores_new_families():
    """Round-4 quality-gate matrix (VERDICT ask #4): the archived real-data
    galleries for the NEW families carry digit-classifier scores above the
    untrained-generator floor (~0.3 confidence / coverage 1-2, see
    igm_tpu/utils/digit_score.py), and the DPM-20 fast-sampler grid drawn
    from the same ddpm_cifar weights scores in the ancestral sampler's
    quality class — the metric behind the 'DDIM-50 quality class in 20
    evals' claim."""
    import json
    from pathlib import Path

    runs = Path(__file__).resolve().parent.parent / "benchmarks" / "real_runs"

    def scores(fam):
        return json.loads((runs / fam / "digit_scores.json").read_text())

    cm = scores("consistency_mnist")
    assert cm["mean_confidence"] >= 0.75 and cm["coverage"] >= 9, cm
    fl = scores("flow_mnist")
    assert fl["mean_confidence"] >= 0.7 and fl["coverage"] >= 7, fl
    ed = scores("edm_mnist")
    assert ed["mean_confidence"] >= 0.7 and ed["coverage"] >= 7, ed
    # VE score-SDE PC-sampled gallery (400 epochs, measured 0.867/10/6.07)
    sd = scores("score_sde_mnist")
    assert sd["mean_confidence"] >= 0.75 and sd["coverage"] >= 9, sd
    edc = scores("edm_cifar")
    assert edc["coverage"] >= 6, edc

    dd = scores("ddpm_cifar")["grids"]
    # ancestral grid = the newest epoch-numbered callback grid (epoch29 in
    # the round-4 archive, epoch59 after the round-5 60-epoch retrain)
    import re
    epoch_grids = {int(m.group(1)): k for k in dd
                   for m in [re.match(r"samples_epoch(\d+)\.jpg", k)] if m}
    anc = dd[epoch_grids[max(epoch_grids)]]
    dpm = dd["samples_dpm20.jpg"]
    # same quality class: DPM-20 within 10% of ancestral confidence and
    # equal coverage (measured round 4: dpm 0.833/10 vs ancestral 0.794/10)
    assert dpm["mean_confidence"] >= anc["mean_confidence"] - 0.1
    assert dpm["coverage"] >= anc["coverage"] - 1


def test_distillation_gallery_gate():
    """Round-5 (VERDICT #1): the progressive-distillation chain on real
    digits must preserve teacher quality at 8 and 4 steps — the family's
    entire point.  Measured (benchmarks/real_runs/distill_mnist, seed-7
    grids from the same chain): teacher DDIM-16 0.851 conf / 10 cov /
    digit-IS 6.66; student-8 0.819/10/5.82; student-4 0.814/10/5.77 —
    full coverage at every halving, confidence within 4%, digit-IS
    within ~13%."""
    import json
    from pathlib import Path

    runs = Path(__file__).resolve().parent.parent / "benchmarks" / "real_runs"
    grids = json.loads(
        (runs / "distill_mnist" / "digit_scores.json").read_text())["grids"]
    teacher = grids["samples_teacher_ddim16.jpg"]
    s8 = grids["samples_student8.jpg"]
    s4 = grids["samples_student4.jpg"]
    assert teacher["coverage"] == 10 and teacher["mean_confidence"] >= 0.8
    for s in (s8, s4):
        assert s["coverage"] >= teacher["coverage"] - 1, s
        assert s["mean_confidence"] >= teacher["mean_confidence"] - 0.05, s
        assert s["inception_score"] >= 0.85 * teacher["inception_score"], s


def test_round5_gallery_gates():
    """Round-5 galleries (VERDICT #4, #5): the previously un-evidenced
    arms now carry scored real-digit grids.
    Measured (benchmarks/real_runs/*, digit classifier at 28x28):
      score_sde_vp_mnist 0.880 conf / 10 cov / digit-IS 6.70 (400 epochs
        — the VP arm actually beats the VE gallery's 0.867/10/6.07);
      moe_dit_mnist 0.782 / 9 / 4.33 (300-epoch Switch-MoE DiT, E=8);
      latent_ddpm_mnist 0.779 / 10 / 4.80 (round-5b redo: 300-epoch
        latent DDPM over the retrained 100-epoch first stage, recon MSE
        0.0146, with latent_scale=auto AND the latent-space x0-clip
        disabled — the two fixes that took the gallery from 0.609/9/2.76
        through a 0.366/2 clip-collapse to this, NOTES.md round 5b)."""
    import json
    from pathlib import Path

    runs = Path(__file__).resolve().parent.parent / "benchmarks" / "real_runs"

    def scores(fam):
        return json.loads((runs / fam / "digit_scores.json").read_text())

    vp = scores("score_sde_vp_mnist")
    assert vp["mean_confidence"] >= 0.8 and vp["coverage"] >= 9, vp
    moe = scores("moe_dit_mnist")
    assert moe["mean_confidence"] >= 0.7 and moe["coverage"] >= 8, moe
    lat = scores("latent_ddpm_mnist")
    assert lat["mean_confidence"] >= 0.7 and lat["coverage"] >= 9, lat
    assert lat["inception_score"] >= 4.0, lat
    # the EMA-codebook first stage (val recon 0.0075 vs gradient 0.0146)
    # lifts the same 300-epoch latent recipe further: 0.817 / 10 / 5.28
    lat_ema = scores("latent_ddpm_mnist_ema")
    assert lat_ema["mean_confidence"] >= 0.75, lat_ema
    assert lat_ema["coverage"] >= 9, lat_ema
    assert lat_ema["inception_score"] >= 4.5, lat_ema

    # DDIM-50 post-clip-fix grid from the retrained ddpm_cifar weights
    # scores in the DPM-20/ancestral class (0.848/10/6.04 vs 0.851/10/6.07
    # and 0.837/10/5.99) — the gallery-side confirmation of the
    # ddim_sweep_round5 resolution
    dd = scores("ddpm_cifar")["grids"]
    ddim = dd["samples_ddim50.jpg"]
    dpm = dd["samples_dpm20.jpg"]
    assert ddim["mean_confidence"] >= dpm["mean_confidence"] - 0.02
    assert ddim["coverage"] >= dpm["coverage"]
    assert ddim["inception_score"] >= 0.95 * dpm["inception_score"]


def test_moe_router_health_real_run():
    """Round-5 (VERDICT #5): MoE learning evidence — the 300-epoch real-
    digit Switch-MoE DiT run's router never collapses.  Measured curves
    (benchmarks/real_runs/moe_dit_mnist/curves.json): normalized load
    entropy >= 0.971 at EVERY logged step (1.0 = perfectly uniform),
    min expert share (x E) never below 0.53 and 0.888 at the end, aux
    loss -> 1.003 (the balanced fixed point of the Switch aux), train
    loss 0.988 -> 0.048."""
    import json
    from pathlib import Path

    runs = Path(__file__).resolve().parent.parent / "benchmarks" / "real_runs"
    curves = json.loads(
        (runs / "moe_dit_mnist" / "curves.json").read_text())
    ent = [v for _, v in curves["moe/load_entropy"]]
    share = [v for _, v in curves["moe/min_share"]]
    loss = [v for _, v in curves["train_loss/loss"]]
    assert min(ent) >= 0.9, min(ent)           # no collapse, ever
    assert share[-1] >= 0.5, share[-1]         # balanced at the end
    assert min(share) >= 0.25, min(share)      # nor transiently starved
    assert loss[-1] <= 0.1 and loss[-1] < 0.2 * loss[0]  # and it LEARNS


def test_cfg_payoff_gate():
    """Round-5 (VERDICT #2): classifier-free guidance quantified on real
    digits (benchmarks/cfg_round5.json — 300-epoch cond models, 16 samples
    per class, seed 11, guidance w in {0,1,2,4}).
    Measured conditional accuracy:
      ddpm/cond_mnist: 0.100 (w=0, = chance: labels ignored) -> 0.494 ->
        0.750 -> 0.894 (w=4, the measured default);
      flow/cond_mnist: 0.131 -> 0.975 -> 1.000 -> 1.000.
    The gate pins the payoff shape: chance at w=0, monotone in w, and
    high accuracy at the per-family default (ddpm w=4, flow w=2)."""
    import json
    from pathlib import Path

    p = (Path(__file__).resolve().parent.parent / "benchmarks"
         / "cfg_round5.json")
    rows = json.loads(p.read_text())["rows"]
    acc = {(r["experiment"], r["guidance"]): r["conditional_accuracy"]
           for r in rows}

    for exp in ("ddpm/cond_mnist", "flow/cond_mnist"):
        ws = sorted(w for e, w in acc if e == exp)
        assert ws == [0.0, 1.0, 2.0, 4.0], ws
        # w=0 is the unconditional branch: chance-level accuracy
        assert acc[(exp, 0.0)] <= 0.25, acc[(exp, 0.0)]
        # guidance never hurts as w grows
        seq = [acc[(exp, w)] for w in ws]
        assert all(b >= a - 1e-6 for a, b in zip(seq, seq[1:])), seq
        # and pays off massively vs unconditional
        assert seq[-1] >= seq[0] + 0.5, seq

    assert acc[("ddpm/cond_mnist", 4.0)] >= 0.85   # the measured default
    assert acc[("flow/cond_mnist", 2.0)] >= 0.95   # flow's default
