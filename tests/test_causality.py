"""Autoregressive causality property tests (SURVEY.md §4 plan).

The reference only verifies masked-conv receptive fields visually
(`src/utils/visual.py`); here it is an assertion: the gradient of output
position i w.r.t. input positions >= i (in AR order) must be exactly zero.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_made_causality():
    from igm_tpu.models.made import MADENet

    d = 16
    net = MADENet(in_dim=d, hidden_dim=32, n_class=4, n_layer=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, d)))

    def out_i(x, i):
        logits = net.apply(params, x[None])[0]  # (d, n_class)
        return logits[i].sum()

    x = jnp.asarray(np.random.default_rng(0).normal(size=(d,)),
                    jnp.float32)
    for i in (0, 5, d - 1):
        g = jax.grad(out_i)(x, i)
        # output i may depend only on inputs with degree < i
        assert np.allclose(np.asarray(g)[i:], 0.0), f"leak at {i}"


def test_made_mask_invariant_survives_training():
    """The masked-kernel entries are zeroed at init and must stay EXACTLY
    zero through optimizer steps (made.py: the forward reads the kernel
    unmasked; correctness rests on this invariant — masked grads are
    zeroed by the custom VJP, so adam moments/updates stay zero)."""
    from igm_tpu.models.made import MADE, build_masks

    dm = {"width": 4, "height": 4, "channels": 1,
          "transforms": {"normalize": True}}
    model = MADE(dm, hidden_dim=12, n_layer=2, lr=1e-2)
    model.steps_per_epoch = 10
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    step = jax.jit(model.train_step)
    rng = np.random.default_rng(0)
    batch = (jnp.asarray(rng.integers(0, 255, (8, 4, 4, 1)), jnp.uint8),
             jnp.zeros((8,), jnp.int32))
    for _ in range(5):
        state, _ = step(state, batch)

    hidden_masks, out_small = build_masks(16, 12, 2, seed=0)
    p = state.params["net"]
    for li, m in enumerate(hidden_masks):
        k = np.asarray(p[f"layers_{li}"]["kernel"])        # (in, out)
        assert np.all(k[m.T == 0] == 0.0), f"hidden layer {li} leak"
        assert np.any(k[m.T == 1] != 0.0)
    k_out = np.asarray(p["out_layer"]["kernel"])           # (hidden, in*nc)
    # expanded mask: (hidden, in*256), column i*256+a <- out_small.T[:, i]
    mask_exp = np.repeat(out_small.T, 256, axis=1)
    assert np.all(k_out[mask_exp == 0] == 0.0), "output layer leak"
    assert np.any(k_out[mask_exp == 1] != 0.0)


def test_pixelcnn_causality():
    from igm_tpu.models.pixelcnn import PixelCNNNet

    h = w = 7
    net = PixelCNNNet(channels=1, hidden_dim=8)
    x0 = jnp.zeros((1, h, w, 1))
    params = net.init(jax.random.PRNGKey(0), x0, None)

    def out_at(x, hh, ww):
        logits = net.apply(params, x, None)  # (1, H, W, C, 256)
        return logits[0, hh, ww].sum()

    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, h, w, 1)),
                    jnp.float32)
    for (hh, ww) in [(0, 0), (3, 3), (6, 6)]:
        g = np.asarray(jax.grad(out_at)(x, hh, ww))[0, :, :, 0]
        # raster order: no dependence on self or any later pixel
        flat = g.reshape(-1)
        pos = hh * w + ww
        assert np.allclose(flat[pos:], 0.0), f"leak at {(hh, ww)}"


def test_tar_causality():
    from igm_tpu.models.tar import TARNet

    s_img = 9  # 3x3
    net = TARNet(n_tokens=2, d_model=16, nhead=2, num_layers=1, height=3,
                 width=3, class_cond=False, n_classes=1)
    tokens0 = jnp.zeros((1, s_img + 1), jnp.int32)
    params = net.init(jax.random.PRNGKey(0), tokens0, train=False)

    # changing token j must not change logits at positions < j
    base = np.asarray(net.apply(params, tokens0, train=False))
    for j in (3, 7, 9):
        toks = tokens0.at[0, j].set(1)
        out = np.asarray(net.apply(params, toks, train=False))
        diff = np.abs(out - base)[0]  # (S, n_tokens)
        assert np.allclose(diff[:j], 0.0, atol=1e-5), f"leak at {j}"
        assert diff[j:].max() > 0  # sanity: it does change the future


@pytest.mark.slow
def test_ddpm_sampling_chain_shapes():
    """Tiny DDPM ancestral chain runs under jit and produces finite images."""
    from igm_tpu.config import to_node
    from igm_tpu.models.ddpm import DDPM

    dm = to_node({"width": 8, "height": 8, "channels": 1,
                  "transforms": {"convert": True, "normalize": True}})
    model = DDPM(datamodule=dm, hidden_dim=8, timesteps=5, dim_mults=[1, 2])
    model.steps_per_epoch = 10
    state = model.init_state(jax.random.PRNGKey(0))
    imgs = jax.jit(lambda s, r: model.sample(s, r, 2))(
        state, jax.random.PRNGKey(1))
    assert imgs.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(imgs)).all()


def test_vq_straight_through_gradient():
    """d(loss)/d(encoder_out) flows through the quantizer unchanged."""
    from igm_tpu.models.vqvae import VectorQuantizer

    vq = VectorQuantizer(num_embeddings=8, latent_dim=4)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 2, 4)),
                    jnp.float32)
    params = vq.init(jax.random.PRNGKey(0), z)

    def loss(z):
        quant, _vq, _c, _idx = vq.apply(params, z)
        st = z + jax.lax.stop_gradient(quant - z)
        return (st ** 2).sum()

    g = jax.grad(loss)(z)
    quant, _, _, _ = vq.apply(params, z)
    # straight-through: gradient equals d/dq of (q^2) evaluated at quant
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(quant),
                               rtol=1e-5)


def test_pixelcnn_pixel_sliced_logits_match_full():
    """pixel=(h,w) fast path must equal the full forward at that position."""
    from igm_tpu.models.pixelcnn import PixelCNNNet

    h = w = 7
    net = PixelCNNNet(channels=1, hidden_dim=8)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, h, w, 1)),
                    jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x, None)
    full = net.apply(params, x, None)  # (N, H, W, C, 256)
    for (hh, ww) in [(0, 0), (3, 4), (6, 6)]:
        fast = net.apply(params, x, None,
                         pixel=(jnp.int32(hh), jnp.int32(ww)))
        np.testing.assert_allclose(np.asarray(fast),
                                   np.asarray(full[:, hh, ww]), atol=1e-5)


def test_pixelcnn_incremental_logits_match_full():
    """The fast sampler's incremental machinery (row-causal vertical
    precompute + column-scan horizontal steps) must reproduce the full
    forward's logits exactly on a fixed image."""
    from igm_tpu.models.pixelcnn import PixelCNNNet

    h = w = 7
    net = PixelCNNNet(channels=1, hidden_dim=8)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, h, w, 1)),
                    jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x, None)
    full = net.apply(params, x, None)                      # (N,H,W,C,256)
    inc = net.apply(params, x, None, method=PixelCNNNet.row_logits)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=1e-4)


@pytest.mark.slow
def test_pixelcnn_fast_sampler_runs():
    from igm_tpu.config import to_node
    from igm_tpu.models.pixelcnn import PixelCNN

    dm = to_node({"width": 7, "height": 7, "channels": 1, "n_classes": 10,
                  "transforms": {"convert": True, "normalize": True}})
    model = PixelCNN(datamodule=dm, hidden_dim=8)
    model.steps_per_epoch = 10
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    imgs = jax.jit(lambda s, r: model.sample_images(s, r, 2))(
        state, jax.random.PRNGKey(1))
    assert imgs.shape == (2, 7, 7, 1)
    arr = np.asarray(imgs)
    assert np.isfinite(arr).all()
    assert (arr >= -1.0 - 1e-5).all() and (arr <= 1.0 + 1e-5).all()
    assert (arr != -1.0).any()  # actually sampled something


def test_pixelcnn_incremental_logits_match_full_class_cond():
    from igm_tpu.models.pixelcnn import PixelCNNNet

    h = w = 7
    net = PixelCNNNet(channels=1, hidden_dim=8, n_classes=4,
                      class_condition=True)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, h, w, 1)), jnp.float32)
    y = jax.nn.one_hot(jnp.asarray([1, 3]), 4)
    params = net.init(jax.random.PRNGKey(0), x, y)
    full = net.apply(params, x, y)
    inc = net.apply(params, x, y, method=PixelCNNNet.row_logits)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=1e-4)


def test_made_pixel_logits_match_full():
    from igm_tpu.models.made import MADENet

    d = 16
    net = MADENet(in_dim=d, hidden_dim=32, n_class=8, n_layer=2)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(2, d)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    full = net.apply(params, x)  # (N, D, n_class)
    for i in (0, 7, d - 1):
        fast = net.apply(params, x, jnp.int32(i),
                         method=MADENet.pixel_logits)
        np.testing.assert_allclose(np.asarray(fast),
                                   np.asarray(full[:, i]), atol=1e-5)


@pytest.mark.slow
def test_ddpm_ema_and_ddim():
    from igm_tpu.config import to_node
    from igm_tpu.models.ddpm import DDPM

    dm = to_node({"width": 8, "height": 8, "channels": 1,
                  "transforms": {"convert": True, "normalize": True}})
    model = DDPM(datamodule=dm, hidden_dim=8, timesteps=20, dim_mults=[1, 2],
                 ema_decay=0.9)
    model.steps_per_epoch = 10
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    assert "ema" in state.opt_states
    batch = (np.zeros((4, 8, 8, 1), np.uint8), np.zeros((4,), np.int32))
    state2, _ = jax.jit(model.train_step)(state, batch)
    # ema moved toward the updated params but is not equal to them
    p = jax.tree_util.tree_leaves(state2.params["denoise"])
    e = jax.tree_util.tree_leaves(state2.opt_states["ema"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in zip(p, e))
    imgs = jax.jit(lambda s, r: model.ddim_sample(s, r, 2, steps=5))(
        state2, jax.random.PRNGKey(1))
    assert imgs.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(imgs)).all()
