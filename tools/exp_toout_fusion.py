"""A/B: fold the to_out projection into the flash-attention kernel epilogue.

VERDICT r2 named this lever twice.  Arithmetic says it should be ~neutral:
the fused per-head (S,64)x(64,inner) matmul contracts over 64 lanes
(half-MXU, 2x the MXU time of the full-width (B*S,inner)x(inner,inner)
outside), in exchange for skipping one HBM round-trip of the attention
output (~1 ms at b160 lvl0).  This experiment measures it.

Fused layout: grid (b, h) with h innermost; the output block index map is
constant over h, so the (S, inner) fp32 accumulator tile stays resident in
VMEM across head steps and each head adds its attn_tile @ W_h slice.

    python tools/exp_toout_fusion.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from gswm.ops.attention import flash_attention  # noqa: E402


def _fused_kernel(q_ref, k_ref, v_ref, w_ref, o_ref, *, block_q, block_k,
                  scale, heads):
    h = pl.program_id(1)

    @pl.when(h == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    seq_q = q_ref.shape[1]
    w = w_ref[0]  # (d, inner) slice for this head

    def q_tile(qi, _):
        q = q_ref[0, pl.ds(qi * block_q, block_q), :]
        q = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)
        l = jnp.zeros((block_q, 1), jnp.float32)
        acc = jnp.zeros((block_q, q.shape[-1]), jnp.float32)

        def body(kb, carry):
            l, acc = carry
            k = k_ref[0, pl.ds(kb * block_k, block_k), :]
            v = v_ref[0, pl.ds(kb * block_k, block_k), :]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            p = jnp.exp(jnp.minimum(s, 60.0))
            return (l + jnp.sum(p, axis=-1, keepdims=True),
                    acc + jnp.dot(p.astype(v.dtype), v,
                                  preferred_element_type=jnp.float32))

        l, acc = jax.lax.fori_loop(0, k_ref.shape[1] // block_k, body,
                                   (l, acc))
        att = (acc / l).astype(q_ref.dtype)
        o_ref[0, pl.ds(qi * block_q, block_q), :] += jnp.dot(
            att, w, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, seq_q // block_q, q_tile, 0)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def fused_attn_out(q, k, v, w_out, block_q=512, block_k=2048):
    """q/k/v (B,S,H,D); w_out (H*D, inner).  Returns (B,S,inner) fp32."""
    b, s, h, d = q.shape
    inner = w_out.shape[1]
    scale = d**-0.5

    def to_bhsd(t):
        return jnp.transpose(t, (0, 2, 1, 3))  # (B,H,S,D)

    w3 = w_out.reshape(h, d, inner)
    kernel = functools.partial(_fused_kernel, block_q=block_q,
                               block_k=block_k, scale=scale, heads=h)
    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, s, d), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, inner), lambda bi, hi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, inner), lambda bi, hi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, inner), jnp.float32),
    )(to_bhsd(q), to_bhsd(k), to_bhsd(v), w3)


def delta_time(fn, n1=4, n2=12):
    """Tunnel-honest timing: enqueue n async executions, fetch only the
    last; difference two n values (docs/BENCH.md round-2 method)."""
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return time.perf_counter() - t0

    run(2)  # warm
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    b, s, h, d, inner = 160, 4096, 5, 64, 320
    kq, kk, kv, kw = jax.random.split(jax.random.key(0), 4)
    q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
    w = jax.random.normal(kw, (h * d, inner), jnp.bfloat16) * 0.05

    @jax.jit
    def baseline(q, k, v, w):
        o = flash_attention(q, k, v)
        return jnp.dot(o.reshape(b, s, h * d), w,
                       preferred_element_type=jnp.float32)

    ref = baseline(q, k, v, w)
    ref.block_until_ready()
    t_base = delta_time(lambda: baseline(q, k, v, w))
    print(f"baseline (kernel + outside to_out): {t_base*1e3:.1f} ms")

    try:
        got = fused_attn_out(q, k, v, w)
        err = float(jnp.max(jnp.abs(got - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"fused epilogue rel err: {err:.2e}")
        t_fused = delta_time(lambda: fused_attn_out(q, k, v, w))
        print(f"fused (to_out in epilogue):        {t_fused*1e3:.1f} ms")
    except Exception as e:
        print(f"fused FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
