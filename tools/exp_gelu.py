"""Micro A/B: exact erf gelu (diffusers parity, round-3 default) vs tanh
approximation, at GEGLU's hot shape — did the parity fix cost throughput?

Usage: python tools/exp_gelu.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gswm-jax-cache")


def timed(fn, iters=16):
    def run(n):
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        np.asarray(jnp.sum(out))
        return time.perf_counter() - t0

    run(1)
    t_small, t_large = run(2), run(2 + iters)
    return (t_large - t_small) / iters


def main():
    # GEGLU gate at SD lvl0, batch 160: (160*4096, 1280) bf16
    x = jax.random.normal(jax.random.key(0), (160 * 4096, 1280),
                          jnp.bfloat16)
    h = jax.random.normal(jax.random.key(1), (160 * 4096, 1280),
                          jnp.bfloat16)

    @jax.jit
    def geglu_erf(h, x):
        return h * jax.nn.gelu(x, approximate=False)

    @jax.jit
    def geglu_tanh(h, x):
        return h * jax.nn.gelu(x, approximate=True)

    @jax.jit
    def geglu_erf32(h, x):
        return h * jax.nn.gelu(x.astype(jnp.float32),
                               approximate=False).astype(x.dtype)

    for name, fn in [("erf (bf16 in)", geglu_erf),
                     ("tanh (bf16 in)", geglu_tanh),
                     ("erf (fp32 compute)", geglu_erf32)]:
        dt = timed(lambda fn=fn: fn(h, x))
        print(f"gelu {name}: {dt*1e3:.2f} ms "
              f"({x.size/dt/1e9:.0f} Gelem/s)", flush=True)


if __name__ == "__main__":
    main()
