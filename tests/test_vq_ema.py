"""EMA-codebook VectorQuantizer (beyond reference parity).

The reference trains its codebook by gradient (`src/models/vqvae.py:38-39`,
mirrored by ``codebook_update=gradient``).  That recipe has a MEASURED
instability on the real digits: the commitment distance transiently
explodes (peaks ~33-91 per-dim MSE in
``benchmarks/real_runs/vqvae_mnist{,_r5}/curves.json``) and recovery
timing is run-dependent — the round-5 30-epoch rerun ended mid-recovery at
recon 0.22 while the identical round-2 run recovered to 0.06.
``codebook_update=ema`` (van den Oord 2017 appendix A.1) moves codes
directly toward assigned-encoder-cluster means, so the codebook tracks the
encoder's scale by construction.  These tests pin:

* the EMA update's math (convergence to cluster means, decay semantics)
* the model integration (param-less vq module, mutables threading,
  checkpoint-shaped state, eval purity)
* the stability property the mode exists for: on a synthetic task scaled
  to provoke the gradient mode's explosion, EMA's peak commitment loss
  stays orders of magnitude below the gradient mode's.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.config import to_node
from igm_tpu.models.vqvae import VQVAE, VectorQuantizer

DM = to_node({"width": 16, "height": 16, "channels": 1,
              "transforms": {"convert": True, "normalize": True}})


def _mk_model(update: str, k: int = 32, latent_dim: int = 8, **kw):
    enc = to_node({"_target_": "igm_tpu.networks.vqvae.Encoder",
                   "n_res_layers": 1, "res_h_dim": 8})
    dec = to_node({"_target_": "igm_tpu.networks.vqvae.Decoder",
                   "n_res_layers": 1, "res_h_dim": 8, "h_dim": 8})
    model = VQVAE(DM, encoder=enc, decoder=dec, latent_dim=latent_dim,
                  num_embeddings=k, codebook_update=update, **kw)
    model.steps_per_epoch = 10
    return model


# --------------------------------------------------------------- unit math
def test_ema_converges_to_cluster_means():
    """Feeding the same 3-cluster batch repeatedly must drive the used
    codes to the cluster means (the EMA fixed point)."""
    k, d = 8, 4
    vq = VectorQuantizer(k, d, ema=True, ema_decay=0.5)
    rng = jax.random.PRNGKey(0)
    means = jnp.array([[4.0, 0, 0, 0], [0, 4.0, 0, 0], [0, 0, 4.0, 0]])
    pts = jnp.repeat(means, 16, axis=0)  # (48, 4), zero-variance clusters
    z = pts.reshape(1, 6, 8, d)
    variables = vq.init({"params": rng}, z, train=False)
    assert "params" not in variables  # param-less by design
    mut = {"codebook": dict(variables["codebook"])}
    for _ in range(40):
        (quant, vq_loss, commit, idx), new_vars = vq.apply(
            {"codebook": mut["codebook"]}, z, train=True,
            mutable=["codebook"])
        mut = dict(new_vars)
    assert float(vq_loss) == 0.0
    # every input must now be quantized to (numerically) its cluster mean
    final_q, _vql, _commit, _idx = vq.apply(
        {"codebook": mut["codebook"]}, z, train=False)
    np.testing.assert_allclose(np.asarray(final_q[0]).reshape(-1, d), pts,
                               atol=1e-2)
    assert float(commit) < 1e-3


def test_ema_eval_does_not_mutate():
    k, d = 8, 4
    vq = VectorQuantizer(k, d, ema=True)
    z = jnp.ones((1, 2, 2, d))
    variables = vq.init({"params": jax.random.PRNGKey(0)}, z, train=False)
    out = vq.apply(variables, z, train=False)  # no mutable= -> must not write
    before = np.asarray(variables["codebook"]["embedding"])
    out2 = vq.apply(variables, z, train=False)
    np.testing.assert_array_equal(
        before, np.asarray(variables["codebook"]["embedding"]))


def test_gradient_mode_unchanged():
    """Parity mode still exposes a trained `embedding` param and a
    nonzero vq loss."""
    k, d = 8, 4
    vq = VectorQuantizer(k, d)  # default gradient
    z = jnp.ones((1, 2, 2, d)) * 3.0
    variables = vq.init({"params": jax.random.PRNGKey(0)}, z, train=False)
    assert variables["params"]["embedding"].shape == (k, d)
    quant, vq_loss, commit, idx = vq.apply(variables, z, train=True)
    assert float(vq_loss) > 0.0 and float(commit) > 0.0


# ---------------------------------------------------------- model plumbing
def test_model_ema_state_and_steps():
    model = _mk_model("ema")
    state = model.init_state(jax.random.PRNGKey(0))
    assert state.params["vq"] == {}  # nothing for the optimizer
    assert "codebook" in state.mutables["vq"]
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (16, 16, 16, 1))
    batch = (imgs, jnp.zeros((16,), jnp.int32))
    emb0 = np.asarray(state.mutables["vq"]["codebook"]["embedding"])
    step = jax.jit(model.train_step)
    for _ in range(3):
        state, metrics = step(state, batch)
    emb1 = np.asarray(state.mutables["vq"]["codebook"]["embedding"])
    assert not np.allclose(emb0, emb1), "EMA codebook never moved"
    assert float(metrics["train_loss/vq_loss"]) == 0.0
    assert np.isfinite(float(metrics["train_loss/recon_loss"]))
    # eval path runs off the mutable codebook
    recon = model.forward(state, model.preprocess(imgs))
    assert recon.shape == imgs.shape


def test_model_rejects_bad_update_mode():
    with pytest.raises(ValueError):
        _mk_model("momentum")


# ------------------------------------------------------- stability property
def test_ema_kills_commit_explosion():
    """The failure mode the option exists for, reproduced in miniature:
    large-scale inputs + the tiny U(-1/K,1/K) codebook init make the
    gradient mode's encoder-to-code distance blow up before Adam can drag
    the (initially near-zero) codes out; EMA codes jump to the encoder's
    scale in a few steps.  Compare peak commitment loss over a short run
    on the SAME data and seed."""
    peaks = {}
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (32, 16, 16, 1))
    batch = (imgs, jnp.zeros((32,), jnp.int32))
    for mode in ("gradient", "ema"):
        # lr 10x the config's 1e-3 compresses the real run's ~100-step
        # scale growth into a CPU-sized test.
        model = _mk_model(mode, k=64, lr=1e-2)
        state = model.init_state(jax.random.PRNGKey(0))
        step = jax.jit(model.train_step)
        peak = 0.0
        for _ in range(80):
            state, metrics = step(state, batch)
            peak = max(peak, float(metrics["train_loss/commit_loss"]))
        peaks[mode] = peak
    # the gradient mode's peak is set by the encoder's scale growth vs the
    # ~1/K codebook; EMA must track it at least 5x tighter throughout.
    assert peaks["ema"] * 5 < peaks["gradient"], peaks


# ------------------------------------------------------ on-chip A/B gate
def test_ema_ab_real_run_artifacts():
    """Round-5 on-chip A/B (same budget: 30 epochs, seed 3, real digits,
    archived benchmarks/real_runs/vqvae_mnist_{ema,grad30}): the EMA
    codebook reproduces the miniature stability property at full scale.
    Measured: gradient-mode commitment loss explodes to a peak of 93.9
    (the pathology the option exists for) and ends at val recon 0.108;
    EMA peaks at 0.122 (770x tighter) and ends at val recon 0.0218 (5.0x
    better) at identical throughput (30.6 vs 29.7 imgs/s)."""
    import json
    from pathlib import Path

    runs = Path(__file__).resolve().parent.parent / "benchmarks" / "real_runs"
    curves = {}
    summary = {}
    for name in ("vqvae_mnist_ema", "vqvae_mnist_grad30"):
        curves[name] = json.loads((runs / name / "curves.json").read_text())
        summary[name] = json.loads((runs / name / "summary.json").read_text())

    peak = {n: max(v for _, v in c["train_loss/commit_loss"])
            for n, c in curves.items()}
    # the gradient arm's measured explosion, and EMA killing it
    assert peak["vqvae_mnist_grad30"] > 10, peak
    assert peak["vqvae_mnist_ema"] < 0.5, peak
    assert peak["vqvae_mnist_ema"] * 100 < peak["vqvae_mnist_grad30"], peak

    recon = {n: s["val/recon_loss"]["last"][1] for n, s in summary.items()}
    # and the quality payoff: >=2x better reconstruction at equal budget
    assert recon["vqvae_mnist_ema"] * 2 < recon["vqvae_mnist_grad30"], recon
    assert recon["vqvae_mnist_ema"] < 0.05, recon


# ------------------------------------------------------------ sample()
@pytest.mark.parametrize("mode", ["gradient", "ema"])
def test_sample_decodes_random_codes(mode):
    """VQVAE.sample decodes a uniform-random code grid (the reference's
    inherited sample crashes on the conv decoder, and its own docstring
    disclaims meaningful sampling, src/models/vqvae.py:78) — ours must at
    least RUN for the generic sampling/export tools, in both codebook
    modes, with the right geometry and finite values."""
    model = _mk_model(mode)
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    imgs = model.sample(state, jax.random.PRNGKey(1), 3)
    assert imgs.shape == (3, 16, 16, 1)
    assert np.isfinite(np.asarray(imgs)).all()
    # numpy-leaf state (orbax restore shape): the gather must still trace
    npstate = jax.tree_util.tree_map(np.asarray, state)
    out = jax.jit(lambda s, r: model.sample(s, r, 3))(
        npstate, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(imgs), np.asarray(out), atol=1e-6)
