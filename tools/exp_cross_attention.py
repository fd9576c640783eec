"""A/B: cross-attention (77-token KV) einsum vs a padded small-KV pallas path.

Round-2 measured the einsum at 17.5 ms per SD lvl0 call (b128) — that path
materializes the (b, h, 4096, 77) fp32 logits in HBM three times (write,
softmax read, PV read).  Hypothesis: the round-2 "dedicated small-KV kernel"
failures (590/977 ms) came from per-q-tile grids (30 us/step pipeline
overhead x 20k steps) and/or an unpadded 77-lane K — the existing RESIDENT
kernel with K/V padded to 128 lanes and grid (bh,) should be ~HBM-bound
(Q read + O write only ≈ 1 ms at lvl0).

Usage: python tools/exp_cross_attention.py [batch]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gswm-jax-cache")
sys.path.insert(0, ".")

from gswm.ops.attention import _flash_bhsd, _pad_to  # noqa: E402


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


@jax.jit
def einsum_attn(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d**-0.5)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)


def kernel_attn(q, k, v, block_q):
    b, sq, h, d = q.shape
    def to_bhsd(t):
        return jnp.transpose(t, (0, 2, 1, 3)).reshape(b * h, t.shape[1], d)
    qb = to_bhsd(q)
    kb, sk0 = _pad_to(to_bhsd(k), 1, 128)
    vb, _ = _pad_to(to_bhsd(v), 1, 128)
    out = _flash_bhsd(qb, kb, vb, block_q, 128, valid_k=sk0, interpret=False)
    return jnp.transpose(out.reshape(b, h, sq, d), (0, 2, 1, 3))


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    for name, bb, sq, h in [("lvl0", b, 4096, 5), ("lvl1", b, 1024, 10)]:
        kq, kk, kv = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(kq, (bb, sq, h, 64), jnp.bfloat16)
        k = jax.random.normal(kk, (bb, 77, h, 64), jnp.bfloat16)
        v = jax.random.normal(kv, (bb, 77, h, 64), jnp.bfloat16)

        # correctness vs einsum first
        ref = einsum_attn(q, k, v)
        for bq in (512, 1024, 2048):
            got = kernel_attn(q, k, v, bq)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                        - got.astype(jnp.float32))))
            dt = timed(lambda bq=bq: kernel_attn(q, k, v, bq))
            print(f"{name} b{bb} {sq}x77 kernel bq={bq}: {dt*1e3:.2f} ms "
                  f"(max err vs einsum {err:.2e})", flush=True)
        dt = timed(lambda: einsum_attn(q, k, v))
        print(f"{name} b{bb} {sq}x77 einsum: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
