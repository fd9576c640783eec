"""Attribute the lvl0 flash kernel's 84-vs-116.5 TF/s residual.

The softmax-side experiments (exp_attn_sched.py) all tied — so what DOES
the kernel spend its non-matmul time on?  This harness times the real
cres kernel against stripped variants that keep the exact same grid,
DMA, block shapes and matmul sequence but delete softmax work in stages:

  full      the shipped kernel (_attend_kv_loop, no-max path)
  noexp     p = min(s, clamp)        — transcendental deleted, all memory
                                       traffic and the l/sum chain kept
  nosum     p = exp(min(s, clamp))   — l/sum + final divide deleted
  skeleton  p = s cast to bf16       — QK -> cast -> PV only (the pure
                                       matmul + logits-traffic floor)

Variants are injected by monkeypatching gswm.ops.attention._attend_kv_loop
(the kernel resolves it at trace time); flash_attention_cres.clear_cache()
between variants forces a retrace.  Effective TF/s uses the attention
FLOPs 4*b*h*s^2*d over the measured step time.

    python tools/exp_attn_skeleton.py [b s heads d c_kv]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gswm-jax-cache")
sys.path.insert(0, ".")

import gswm.ops.attention as A  # noqa: E402

_REAL_LOOP = A._attend_kv_loop


def _accessors(q, k_ref, v_ref, block_k, seq_k):
    if callable(k_ref):
        return k_ref, v_ref, seq_k
    sk = k_ref.shape[1]

    def k_get(kb):
        return k_ref[0, A.pl.ds(kb * block_k, block_k), :]

    def v_get(kb):
        return v_ref[0, A.pl.ds(kb * block_k, block_k), :]

    return k_get, v_get, sk


def _make_loop(mode):
    def loop(q, k_ref, v_ref, *, block_k, valid_k, use_max, seq_k=None):
        k_get, v_get, sk = _accessors(q, k_ref, v_ref, block_k, seq_k)
        block_q, d = q.shape
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc0 = jnp.zeros((block_q, d), jnp.float32)

        def body(kb, carry):
            l, acc = carry
            k = k_get(kb)
            v = v_get(kb)
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            if mode == "noexp":
                p = jnp.minimum(s, A._NOMAX_CLAMP)
            elif mode == "nosum":
                p = jnp.exp(jnp.minimum(s, A._NOMAX_CLAMP))
            else:  # skeleton
                p = s
            if mode in ("noexp",):
                l = l + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc + jnp.dot(p.astype(v.dtype), v,
                                preferred_element_type=jnp.float32)
            return l, acc

        l, acc = jax.lax.fori_loop(0, sk // block_k, body, (l0, acc0))
        if mode == "noexp":
            return acc / l
        return acc * (1.0 / sk)

    return loop


def timeit(fn, n1=3, n2=9):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        np.asarray(out)
        return time.perf_counter() - t0

    run(2)
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    args = [int(a) for a in sys.argv[1:]] or [160, 4096, 5, 64, 384]
    b, s, h, d, c_kv = args
    inner = h * d
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = (jax.random.normal(kq, (b, s, inner)) * 0.3).astype(jnp.bfloat16)
    k = (jax.random.normal(kk, (b, s, c_kv)) * 0.3).astype(jnp.bfloat16)
    v = (jax.random.normal(kv, (b, s, c_kv)) * 0.3).astype(jnp.bfloat16)
    flops = 4.0 * b * h * s * s * d
    print(f"cres isolated: b={b} s={s} h={h} d={d} c_kv={c_kv} "
          f"({flops / 1e12:.2f} TF/call)", flush=True)

    @jax.jit
    def run_full(q, k, v):
        return jnp.sum(A.flash_attention_cres(q, k, v, h, d)
                       .astype(jnp.float32))

    base = None
    for mode in ("full", "noexp", "nosum", "skeleton"):
        A.flash_attention_cres.clear_cache()
        A._attend_kv_loop = _REAL_LOOP if mode == "full" else _make_loop(mode)
        try:
            t = timeit(lambda: run_full(q, k, v))
            run_full.clear_cache()
            msg = (f"  {mode:9s} {t * 1e3:8.2f} ms  "
                   f"{flops / t / 1e12:6.1f} TF/s effective")
            if mode == "full":
                base = t
            elif base is not None:
                msg += f"  ({(t - base) / base * 100:+.1f}% vs full)"
            print(msg, flush=True)
        except Exception as e:
            print(f"  {mode:9s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        finally:
            A._attend_kv_loop = _REAL_LOOP


if __name__ == "__main__":
    main()
