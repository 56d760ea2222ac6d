"""Golden-value unit tests against torch (CPU) and hand-computed numpy.

SURVEY.md §4 plan: losses and diffusion tables verified against the exact
formulas the reference uses.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402


def test_adversarial_loss_vs_torch():
    import torch
    import torch.nn.functional as F
    from igm_tpu.utils.losses import adversarial_loss

    rng = np.random.default_rng(0)
    pred = rng.normal(size=(16, 1)).astype(np.float32)
    tp = torch.tensor(pred)
    # vanilla
    want = F.binary_cross_entropy_with_logits(tp, torch.ones_like(tp)).item()
    got = float(adversarial_loss(jnp.asarray(pred), True, "vanilla"))
    assert abs(want - got) < 1e-5
    want = F.binary_cross_entropy_with_logits(tp, torch.zeros_like(tp)).item()
    got = float(adversarial_loss(jnp.asarray(pred), False, "vanilla"))
    assert abs(want - got) < 1e-5
    # lsgan
    want = F.mse_loss(tp, torch.ones_like(tp)).item()
    got = float(adversarial_loss(jnp.asarray(pred), True, "lsgan"))
    assert abs(want - got) < 1e-5
    # hinge: we use the STANDARD hinge (documented divergence from the
    # reference's buggy real branch, SURVEY.md §8)
    want = torch.clamp(1 - tp, min=0).mean().item()
    got = float(adversarial_loss(jnp.asarray(pred), True, "hinge"))
    assert abs(want - got) < 1e-5
    want = torch.clamp(1 + tp, min=0).mean().item()
    got = float(adversarial_loss(jnp.asarray(pred), False, "hinge"))
    assert abs(want - got) < 1e-5


def test_normal_kld_vs_torch():
    import torch
    from igm_tpu.utils.losses import normal_kld

    rng = np.random.default_rng(1)
    mu = rng.normal(size=(8, 4)).astype(np.float32)
    log_sigma = rng.normal(size=(8, 4)).astype(np.float32) * 0.1
    tmu, tls = torch.tensor(mu), torch.tensor(log_sigma)
    want = (-0.5 * torch.sum(1 + 2 * tls - tmu ** 2 - torch.exp(2 * tls),
                             dim=-1).mean(dim=0)).item()
    got = float(normal_kld(jnp.asarray(mu), jnp.asarray(log_sigma)))
    assert abs(want - got) < 1e-4


def test_gaussian_logprob_vs_torch():
    import torch
    from torch import distributions as D
    from igm_tpu.utils.distributions import GaussianDistribution

    rng = np.random.default_rng(2)
    pred = rng.normal(size=(4, 5, 5, 1)).astype(np.float32)
    target = rng.normal(size=(4, 5, 5, 1)).astype(np.float32)
    tp, tt = torch.tensor(pred), torch.tensor(target)
    want = D.Normal(tp, torch.ones_like(tp)).log_prob(tt).sum(dim=[1, 2, 3])
    got = GaussianDistribution().prob(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4)


def test_bernoulli_logprob_vs_torch():
    import torch
    import torch.nn.functional as F
    from igm_tpu.utils.distributions import BernoulliDistribution

    rng = np.random.default_rng(3)
    pred = rng.uniform(0.01, 0.99, size=(4, 5, 5, 1)).astype(np.float32)
    target = (rng.uniform(size=(4, 5, 5, 1)) > 0.5).astype(np.float32)
    want = -F.binary_cross_entropy(torch.tensor(pred), torch.tensor(target),
                                   reduction="none").sum([1, 2, 3])
    got = BernoulliDistribution().prob(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4)


def test_diffusion_tables_golden():
    """Tables must satisfy the identities from ddpm.py:329-350."""
    from igm_tpu.ops.diffusion import make_tables, cosine_beta_schedule

    t = make_tables(100, "cosine")
    betas = np.asarray(cosine_beta_schedule(100))
    alphas_cumprod = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(t.alphas_cumprod), alphas_cumprod,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t.sqrt_recip_alphas_cumprod),
                               np.sqrt(1 / alphas_cumprod), rtol=1e-5)
    prev = np.append(1.0, alphas_cumprod[:-1])
    post_var = betas * (1 - prev) / (1 - alphas_cumprod)
    np.testing.assert_allclose(np.asarray(t.posterior_variance), post_var,
                               rtol=1e-5)
    # q_sample at t=0 is nearly the clean image
    from igm_tpu.ops.diffusion import q_sample
    x = jnp.ones((2, 4, 4, 1))
    noise = jnp.zeros_like(x)
    out = q_sample(t, x, jnp.zeros((2,), jnp.int32), noise)
    np.testing.assert_allclose(np.asarray(out), np.sqrt(alphas_cumprod[0]),
                               rtol=1e-5)


def test_nearest_codebook_vs_cdist():
    import torch
    from igm_tpu.ops.vq import nearest_codebook

    rng = np.random.default_rng(4)
    z = rng.normal(size=(64, 16)).astype(np.float32)
    book = rng.normal(size=(32, 16)).astype(np.float32)
    want = torch.cdist(torch.tensor(z), torch.tensor(book)).argmin(dim=1)
    got = nearest_codebook(jnp.asarray(z), jnp.asarray(book))
    np.testing.assert_array_equal(np.asarray(got), want.numpy())


def test_toy_gmm_shapes():
    import jax
    from igm_tpu.utils.toy import ToyGMM

    gmm = ToyGMM(10)
    samples, labels = gmm.sample(jax.random.PRNGKey(0), 256)
    assert samples.shape == (256, 2)
    # samples concentrate near the unit circle
    radii = np.linalg.norm(np.asarray(samples), axis=1)
    assert 0.5 < float(np.median(radii)) < 1.5
    lp = gmm.log_prob(samples)
    assert np.isfinite(np.asarray(lp)).all()


def test_linear_attention_matches_reference_einsum():
    import torch
    from igm_tpu.ops.attention import linear_attention

    rng = np.random.default_rng(5)
    b, n, h, d = 2, 9, 4, 8
    q = rng.normal(size=(b, n, h, d)).astype(np.float32)
    k = rng.normal(size=(b, n, h, d)).astype(np.float32)
    v = rng.normal(size=(b, n, h, d)).astype(np.float32)
    # reference math (ddpm.py:156-163) in torch layout (b, h, d, n)
    tq = torch.tensor(q).permute(0, 2, 3, 1)
    tk = torch.tensor(k).permute(0, 2, 3, 1).softmax(dim=-1)
    tv = torch.tensor(v).permute(0, 2, 3, 1)
    ctx = torch.einsum("bhdn,bhen->bhde", tk, tv)
    want = torch.einsum("bhde,bhdn->bhen", ctx, tq).permute(0, 3, 1, 2)
    got = linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)


def test_step_lr_schedule():
    from igm_tpu.core.optim import step_lr, halving_lr

    s = step_lr(1.0, 0.99, steps_per_epoch=10)
    assert s(0) == 1.0
    assert abs(s(10) - 0.99) < 1e-9
    assert abs(s(25) - 0.99 ** 2) < 1e-9
    h = halving_lr(1.0, drop_lr_epoch=2, steps_per_epoch=10)
    assert h(0) == 1.0
    assert h(19) == 1.0
    assert h(20) == 0.5
    assert h(45) == 0.25


def test_make_grid_matches_torchvision_layout():
    from igm_tpu.callbacks.visualization import make_grid

    imgs = np.zeros((4, 3, 3, 1), np.float32)
    grid = make_grid(imgs, nrow=2, padding=1, pad_value=1.0)
    assert grid.shape == (1 + 2 * 4, 1 + 2 * 4, 3)
    assert grid[0, 0, 0] == 1.0  # padding
    assert grid[1, 1, 0] == 0.0  # image content


def test_gan_batchnorm_stats_update_in_both_phases():
    """torch train-mode BN parity (SURVEY §7 hard-part 3): D's running stats
    must move during the G phase too (D forward on fakes is train-mode)."""
    import jax
    from igm_tpu.config import to_node
    from igm_tpu.models.gan import GAN

    dm = to_node({"width": 8, "height": 8, "channels": 1,
                  "transforms": {"convert": True, "normalize": True}})
    net_g = to_node({"_target_": "igm_tpu.networks.basic.MLPDecoder",
                     "hidden_dims": [16, 16], "width": 8, "height": 8,
                     "output_act": "tanh", "norm_type": "batch"})
    # NOTE: MLPEncoder's first hidden layer is always layer-normed
    # (basic.py:84-91); two hidden layers ensure a BatchNorm exists in netD
    net_d = to_node({"_target_": "igm_tpu.networks.basic.MLPEncoder",
                     "hidden_dims": [16, 16], "width": 8, "height": 8,
                     "norm_type": "batch"})
    model = GAN(datamodule=dm, netG=net_g, netD=net_d, latent_dim=4)
    model.steps_per_epoch = 10
    state = jax.jit(model.init_state)(jax.random.PRNGKey(0))
    batch = (np.random.default_rng(0).integers(0, 255, (8, 8, 8, 1),
                                               dtype=np.uint8),
             np.zeros((8,), np.int32))
    step = jax.jit(model.train_step)
    before = jax.device_get(state.mutables["netD"])
    state2, _ = step(state, batch)  # step 0 = G phase
    after_g = jax.device_get(state2.mutables["netD"])
    diff = sum(float(np.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after_g)))
    assert diff > 0, "netD batch_stats did not update during the G phase"


def test_qkv_wslice_matches_conv_path():
    """The round-4 kernel-slice qkv path (IGM_ATTN_QKV=wslice, the TPU
    default — the fused 3*hidden activation never materialises) is exactly
    the fused-conv path: same param tree, same init values, bit-identical
    outputs on shared params."""
    import os

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from igm_tpu.networks.unet import LinearAttention

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 16)),
                    jnp.float32)
    old = os.environ.get("IGM_ATTN_QKV")
    try:
        outs, params = {}, {}
        for mode in ("wslice", "conv", "split_heads"):
            os.environ["IGM_ATTN_QKV"] = mode
            m = LinearAttention(16, heads=4, dim_head=8)
            params[mode] = m.init(jax.random.PRNGKey(0), x)
            outs[mode] = m.apply(params["wslice"], x)
        assert jtu.tree_structure(params["wslice"]) == \
            jtu.tree_structure(params["conv"])
        for a, b in zip(jtu.tree_leaves(params["wslice"]),
                        jtu.tree_leaves(params["conv"])):
            assert bool(jnp.array_equal(a, b))
        assert float(jnp.abs(outs["wslice"] - outs["conv"]).max()) == 0.0
        assert float(jnp.abs(outs["wslice"] - outs["split_heads"]).max()) \
            < 1e-5
    finally:
        if old is None:
            os.environ.pop("IGM_ATTN_QKV", None)
        else:
            os.environ["IGM_ATTN_QKV"] = old
