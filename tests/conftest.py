"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere (SURVEY.md §4 distributed-test strategy).

Note: the ambient environment points JAX at a slow, single-chip tunneled TPU
(JAX_PLATFORMS=axon), and the jaxtyping pytest plugin imports jax before this
conftest runs — so env vars alone are too late; we must go through
jax.config.update.  Set GSWM_TEST_TPU=1 to opt in to device tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("GSWM_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the UNet/scan graphs dominate test wall-clock;
# caching makes reruns near-instant.  Machine-tagged for the CPU backend —
# cross-host CPU-AOT entries load with SIGILL-warning spam (ADVICE r3 #4).
from gswm.utils.platform import cpu_cache_dir  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    cpu_cache_dir() if not os.environ.get("GSWM_TEST_TPU")
    else "/tmp/gswm-jax-cache",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
