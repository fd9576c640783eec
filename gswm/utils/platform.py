"""Platform selection helper.

The ambient axon TPU plugin overrides the JAX_PLATFORMS environment variable
(see tests/conftest.py); the config API always wins.  CLIs call
``apply_platform_env()`` first so ``GSWM_PLATFORM=cpu`` (or =tpu) reliably
selects a backend — needed for CI subprocesses and CPU-only hosts.
"""

from __future__ import annotations

import os


def apply_platform_env():
    plat = os.environ.get("GSWM_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    cache = os.environ.get("GSWM_COMPILE_CACHE", "/tmp/gswm-jax-cache")
    if cache:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
