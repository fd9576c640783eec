"""Platform selection helper.

The ambient axon TPU plugin overrides the JAX_PLATFORMS environment variable
(see tests/conftest.py); the config API always wins.  CLIs call
``apply_platform_env()`` first so ``GSWM_PLATFORM=cpu`` (or =tpu) reliably
selects a backend — needed for CI subprocesses and CPU-only hosts.
"""

from __future__ import annotations

import os


def cpu_cache_dir(base: str | None = None) -> str:
    """Machine-tagged compile-cache dir for CPU-backend runs.

    XLA:CPU caches AOT results keyed without host CPU features; loading an
    entry compiled on a different machine spams 'machine feature ... not
    supported ... could lead to SIGILL' errors (they buried the multichip
    gate's verdict line in MULTICHIP_r03.json).  Suffixing the dir with a
    hash of this host's cpuinfo flags makes CPU entries machine-local; TPU
    runs keep sharing the un-suffixed dir (their cache entries are not
    host-AOT).
    """
    base = base or os.environ.get("GSWM_COMPILE_CACHE", "/tmp/gswm-jax-cache")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    tag = hashlib.md5(line.encode()).hexdigest()[:8]
                    return f"{base}-cpu-{tag}"
    except OSError:
        pass
    return base + "-cpu"


def apply_platform_env():
    plat = os.environ.get("GSWM_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    cache = os.environ.get("GSWM_COMPILE_CACHE", "/tmp/gswm-jax-cache")
    if cache:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
