"""Flax InceptionV3 vs a torch mirror of pytorch-fid's network.

VERDICT round-1 item 2: "a test asserting Flax-Inception features match
torch within tolerance on fixed inputs, and FID-vs-torchmetrics agreement
on a fixed image set."  torchvision/torchmetrics are not installed and no
Inception weight file is deliverable in this offline image, so the torch
side is tests/_torch_fid_inception.py — a from-scratch torch.nn mirror of
the exact pytorch-fid network torchmetrics evaluates — with randomised
weights AND randomised BN running stats.  That proves architecture parity
and the torch->npz->Flax converter end-to-end; a real
pt_inception-2015-12-05.pth dropped into the image then needs zero code
changes (point IGM_INCEPTION_WEIGHTS at the converter's npz).

Reference chain: src/callbacks/evaluation.py:8-30 (torchmetrics FID) ->
pytorch-fid InceptionV3 (pool3, 2048-d).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # full 299x299 InceptionV3 compile on CPU


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    """Torch mirror -> converter -> npz -> Flax params."""
    from tests._torch_fid_inception import randomized_mirror
    from tools.convert_inception_weights import convert
    from igm_tpu.networks.inception import load_weights_npz

    net = randomized_mirror(seed=0)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    flat = convert(sd)
    path = tmp_path_factory.mktemp("w") / "inception_fid.npz"
    np.savez(path, **flat)
    return net, load_weights_npz(str(path))


def test_pool3_features_match_torch(converted):
    import jax
    from igm_tpu.networks.inception import InceptionV3

    net, params = converted
    rng = np.random.default_rng(0)
    x01 = rng.random((2, 299, 299, 3), np.float32)  # [0,1]
    x = 2.0 * x01 - 1.0  # pytorch-fid normalize_input

    with torch.no_grad():
        want = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    got = np.asarray(jax.jit(InceptionV3().apply)(params, x))

    assert got.shape == want.shape == (2, 2048)
    # f32 CPU, 94 convs deep: allow small accumulation drift
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.99999, corr


def test_fid_agreement_on_fixed_image_set(converted, tmp_path, monkeypatch):
    """End-to-end: InceptionFeatures backend + Fréchet math vs a pure-torch
    FID computation (torchmetrics' definition) on the same fixed images."""
    from tools.convert_inception_weights import convert
    from igm_tpu.callbacks import fid as fid_lib

    net, _ = converted
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    path = tmp_path / "w.npz"
    np.savez(path, **convert(sd))
    monkeypatch.setenv("IGM_INCEPTION_WEIGHTS", str(path))
    fid_lib._BACKEND_CACHE.clear()
    fe, dim, name = fid_lib.get_feature_backend(None)
    assert name == "inception" and dim == 2048

    rng = np.random.default_rng(1)
    base = rng.integers(60, 200, (8, 32, 32, 3), dtype=np.uint8)
    fake = np.clip(base.astype(int) + rng.integers(-40, 40, base.shape),
                   0, 255).astype(np.uint8)

    def torch_feats(imgs):
        x = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).float() / 255.0
        x = torch.nn.functional.interpolate(
            x, size=(299, 299), mode="bilinear", align_corners=False)
        with torch.no_grad():
            return net(2.0 * x - 1.0).numpy()

    ours_r, ours_f = fe(base), fe(fake)
    torch_r, torch_f = torch_feats(base), torch_feats(fake)
    # feature-level agreement incl. the resize path
    np.testing.assert_allclose(ours_r, torch_r, rtol=2e-2, atol=2e-2)

    def fid_from(fr, ff):
        sr, sf = fid_lib.FeatureStats(dim), fid_lib.FeatureStats(dim)
        sr.update(fr)
        sf.update(ff)
        return fid_lib.frechet_distance(*sr.finalize(), *sf.finalize())

    ours, torchside = fid_from(ours_r, ours_f), fid_from(torch_r, torch_f)
    # guard against vacuous agreement: features must be input-sensitive
    # (a torch-default-init mirror collapses to constants after 94 layers)
    assert float(np.var(torch_r, axis=0).mean()) > 1e-6
    assert torchside > 1e-3, torchside
    assert abs(ours - torchside) / torchside < 0.02, (ours, torchside)
    fid_lib._BACKEND_CACHE.clear()


def test_bilinear_resize_matches_torch():
    """jax.image.resize 'bilinear' == F.interpolate align_corners=False."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    x = rng.random((2, 32, 32, 3), np.float32)
    got = np.asarray(jax.image.resize(
        jnp.asarray(x), (2, 299, 299, 3), "bilinear"))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(299, 299),
        mode="bilinear", align_corners=False).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
