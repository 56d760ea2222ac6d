"""Platform selection helper.

The machine profile pins JAX_PLATFORMS=axon and the plugin re-registers over
plain env overrides (NOTES.md); IGM_PLATFORM=<cpu|tpu|axon> (or an explicit
JAX_PLATFORMS set by the caller) is enforced through jax.config here.
Call before the first device touch.
"""
from __future__ import annotations

import os


def apply_platform_env() -> None:
    want = os.environ.get("IGM_PLATFORM")
    if want:
        import jax
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
