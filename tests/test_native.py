"""Native batcher (C++/ctypes) correctness vs numpy."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from igm_tpu.data import native  # noqa: E402


def test_gather_rows_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (100, 7, 5, 3), dtype=np.uint8)
    idx = rng.integers(0, 100, (32,))
    got = native.gather_rows(src, idx)
    np.testing.assert_array_equal(got, src[idx])


def test_gather_rows_float():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(50, 10)).astype(np.float32)
    idx = rng.integers(0, 50, (16,))
    got = native.gather_rows(src, idx)
    np.testing.assert_array_equal(got, src[idx])


def test_shuffle_perm_is_permutation_and_deterministic():
    p1 = native.shuffle_perm(1000, seed=42)
    p2 = native.shuffle_perm(1000, seed=42)
    p3 = native.shuffle_perm(1000, seed=43)
    np.testing.assert_array_equal(np.sort(p1), np.arange(1000))
    np.testing.assert_array_equal(p1, p2)
    assert not np.array_equal(p1, p3)


def test_native_lib_loaded():
    # toolchain is present in this image; the .so should build & load
    assert native.available()
