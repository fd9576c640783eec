"""Micro-benchmark for the flash attention kernel at SD/SDXL shapes.

Honest timing (device->host fetch).  Usage:
    python tools/bench_attention.py [batch]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gswm-jax-cache")
sys.path.insert(0, ".")

from gswm.ops.attention import flash_attention  # noqa: E402


def timed(fn, iters=12):
    """Per-call device time with the tunnel's fixed dispatch+fetch latency
    cancelled out: enqueue n async executions, fetch only the last result
    (the stream serializes them), and difference two batch sizes.  The
    ~25-30 ms constant RPC overhead of the axon tunnel otherwise swamps
    small kernels (a 2 ms matmul 'measures' 32 ms with per-call fetches)."""
    def run(n):
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        np.asarray(jnp.sum(out))
        return time.perf_counter() - t0

    run(1)  # compile + warm
    t_small, t_large = run(2), run(2 + iters)
    return (t_large - t_small) / iters


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cases = [
        ("SD lvl0 self", b, 4096, 5, 64, 4096),
        ("SD lvl0 cross", b, 4096, 5, 64, 77),
        ("SD 768 lvl0 self", max(b // 4, 1), 9216, 5, 64, 9216),
        ("SDXL 16k self", max(b // 16, 1), 16384, 10, 64, 16384),
    ]
    for name, bb, sq, h, d, sk in cases:
        kq, kk, kv = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(kq, (bb, sq, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (bb, sk, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (bb, sk, h, d), jnp.bfloat16)
        dt = timed(lambda: flash_attention(q, k, v, interpret=False))
        flops = 4.0 * bb * h * sq * sk * d
        print(f"{name}: batch {bb} seq {sq}x{sk} heads {h} -> "
              f"{dt*1e3:.1f} ms, {flops/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
