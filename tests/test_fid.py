"""FID machinery golden tests (frechet distance + streaming stats)."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.callbacks.fid import FeatureStats, frechet_distance  # noqa: E402


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=(8,))
    a = rng.normal(size=(8, 8))
    cov = a @ a.T + np.eye(8)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6


def test_frechet_mean_shift_analytic():
    # diagonal covs: FID = ||dmu||^2 + sum (sqrt(c1)-sqrt(c2))^2
    mu1 = np.zeros(4)
    mu2 = np.ones(4) * 2.0
    c1 = np.diag([1.0, 2.0, 3.0, 4.0])
    c2 = np.diag([2.0, 2.0, 1.0, 4.0])
    want = 16.0 + sum((np.sqrt(np.diag(c1)) - np.sqrt(np.diag(c2))) ** 2)
    got = frechet_distance(mu1, c1, mu2, c2)
    assert abs(got - want) < 1e-6


def test_streaming_stats_match_numpy():
    rng = np.random.default_rng(1)
    data = rng.normal(size=(500, 16))
    stats = FeatureStats(16)
    for chunk in np.array_split(data, 7):
        stats.update(chunk)
    mu, cov = stats.finalize()
    np.testing.assert_allclose(mu, data.mean(axis=0), rtol=1e-10)
    np.testing.assert_allclose(cov, np.cov(data, rowvar=False), rtol=1e-8)


def test_fid_separates_distributions():
    """FID(real, real-like) << FID(real, shifted) with the random backend."""
    from igm_tpu.callbacks.fid import get_feature_backend

    fe, dim, name = get_feature_backend("random")
    rng = np.random.default_rng(2)
    base = rng.integers(100, 150, (64, 32, 32, 3), dtype=np.uint8)
    similar = np.clip(base.astype(int) + rng.integers(-5, 5, base.shape),
                      0, 255).astype(np.uint8)
    different = rng.integers(0, 255, (64, 32, 32, 3), dtype=np.uint8)

    def fid_of(a, b):
        sa, sb = FeatureStats(dim), FeatureStats(dim)
        sa.update(fe(a))
        sb.update(fe(b))
        return frechet_distance(*sa.finalize(), *sb.finalize())

    close = fid_of(base, similar)
    far = fid_of(base, different)
    assert far > 3 * close
