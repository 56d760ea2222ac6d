"""Test config: force CPU backend with 8 virtual devices BEFORE jax imports.

This fakes an 8-chip mesh so data-parallel sharding paths are exercised
without TPU hardware (SURVEY.md §4 test plan).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Tests use tiny models; keep compiles fast and deterministic.
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Synthetic data for datamodule tests (no network egress in CI).
os.environ.setdefault("IGM_SYNTHETIC_DATA", "1")

import jax  # noqa: E402

# The machine profile pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must
# run on the in-process CPU backend with 8 virtual devices.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8

import pytest  # noqa: E402
from pathlib import Path  # noqa: E402

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def config_dir() -> Path:
    return REPO / "configs"


@pytest.fixture(scope="session", autouse=True)
def _ensure_real_datasets():
    """data/ is generated (gitignored) — materialise it once per session so
    the real-bytes parser and real-data convergence tests always have the
    deterministic packaged datasets (igm_tpu/data/packaged.py)."""
    from igm_tpu.data import packaged
    packaged.ensure(REPO / "data")
