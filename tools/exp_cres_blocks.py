"""Block-size sweep for the channel-resident attention tier at SD lvl0
shapes — in context (projection producer + to_out consumer inside lax.scan,
same harness shape as exp_attn_context) so relayout effects are visible.

    python tools/exp_cres_blocks.py [lvl0]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gswm-jax-cache")
sys.path.insert(0, ".")

from gswm.ops.attention import (  # noqa: E402
    _cres_blocks,
    _CRES_BLOCKS,
    flash_attention_cres,
)

SHAPES = {
    "lvl0": (160, 4096, 320, 5, 64),
    "sdxl_lvl0": (8, 4096, 640, 10, 64),
}


def make_fn(b, s, c, h, d, bq, bk):
    inner = h * d
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    wqkv = (jax.random.normal(k1, (c, 3 * inner)) * 0.05).astype(jnp.bfloat16)
    wout = (jax.random.normal(k2, (inner, c)) * 0.05).astype(jnp.bfloat16)
    x0 = jax.random.normal(k3, (b, s, c)).astype(jnp.bfloat16)
    pad = (-inner) % 128

    def padc(w):
        return w if pad == 0 else jnp.pad(w, ((0, 0), (0, pad)))

    @jax.jit
    def run(x0, wqkv, wout):
        def step(x, _):
            q = jnp.dot(x, wqkv[:, :inner])
            k = jnp.dot(x, padc(wqkv[:, inner:2 * inner]))
            v = jnp.dot(x, padc(wqkv[:, 2 * inner:]))
            o = flash_attention_cres(q, k, v, h, d, block_q=bq, block_k=bk)
            return (x + 0.1 * jnp.dot(o, wout)).astype(x.dtype), ()

        y, _ = jax.lax.scan(step, x0, None, length=4)
        return jnp.sum(y.astype(jnp.float32))

    return lambda: run(x0, wqkv, wout)


def delta_time(fn, n1=3, n2=9):
    def run(n):
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        np.asarray(out)
        return time.perf_counter() - t0

    run(2)
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    names = sys.argv[1:] or ["lvl0"]
    itemsize = 2
    for name in names:
        b, s, c, h, d = SHAPES[name]
        inner = h * d
        c_kv = -(-inner // 128) * 128
        auto = _cres_blocks(s, c_kv, inner, d, itemsize)
        print(f"{name}: (b={b}, s={s}, c={c}, h={h}, d={d}); "
              f"auto blocks = {auto}", flush=True)
        for bq, bk in _CRES_BLOCKS:
            if s % bq or s % bk:
                continue
            try:
                t = delta_time(make_fn(b, s, c, h, d, bq, bk)) / 4
                tag = " <- auto" if (bq, bk) == auto else ""
                print(f"  bq={bq:4d} bk={bk:4d}  {t*1e3:8.2f} ms/step{tag}",
                      flush=True)
            except Exception as e:
                print(f"  bq={bq:4d} bk={bk:4d}  FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
