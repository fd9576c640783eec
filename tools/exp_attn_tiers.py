"""A/B: flash tier + block sweeps at SD shapes (round-3 perf hunt).

1. lvl0 (4096 tokens): head-resident (internal q-tile fori) vs KV-resident
   (q tiles as a grid dim -> Pallas double-buffers q/o and may overlap DMA
   with VPU/MXU phases across adjacent tiles).
2. 768-lvl0 (9216 tokens): block_q sweep for the KV-resident tier
   (VERDICT r2 next #6 asks for exactly this sweep at this shape).

Usage: python tools/exp_attn_tiers.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gswm-jax-cache")
sys.path.insert(0, ".")

from gswm.ops.attention import flash_attention  # noqa: E402


def timed(fn, iters=12):
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


def bench(name, b, s, h, d, tier, block_q=None, block_k=None):
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
    if tier:
        os.environ["GSWM_FLASH_TIER"] = tier
    else:
        os.environ.pop("GSWM_FLASH_TIER", None)
    try:
        dt = timed(lambda: flash_attention(q, k, v, block_q=block_q,
                                           block_k=block_k))
    except Exception as e:
        print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:120]})",
              flush=True)
        return
    finally:
        os.environ.pop("GSWM_FLASH_TIER", None)
    fl = 4.0 * b * h * s * s * d
    print(f"{name}: {dt*1e3:.1f} ms, {fl/dt/1e12:.1f} TFLOP/s", flush=True)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    # lvl0 tier A/B (default blocks; bk resolves to full-row 4096)
    bench("lvl0 resident (default)", b, 4096, 5, 64, None)
    for bq in (256, 512, 1024):
        bench(f"lvl0 kvres bq={bq}", b, 4096, 5, 64, "kvres",
              block_q=bq, block_k=2048)
    # 768's 9216 tokens: kvres block_q sweep (current default bq=512)
    b768 = max(b // 5, 1)
    bench("9216 kvres default", b768, 9216, 5, 64, None)
    for bq in (256, 1024, 1536):
        bench(f"9216 kvres bq={bq}", b768, 9216, 5, 64, "kvres",
              block_q=bq, block_k=2048)
    for bk in (1024, 4096):
        bench(f"9216 kvres bq=512 bk={bk}", b768, 9216, 5, 64, "kvres",
              block_q=512, block_k=bk)


if __name__ == "__main__":
    main()
