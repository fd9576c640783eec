"""Measure per-dispatch host overhead on the tunneled runtime.

The round-3 op-level trace shows ~1.9 s/pass of wall-minus-device gap at
512x512 b160 (docs/BENCH.md).  Candidate causes: (a) the ~30 ms fixed RPC
cost per eager/jit dispatch multiplied by the number of dispatches in the
unfused chain, (b) per-call argument marshaling of the ~1000-leaf UNet
params pytree.  This experiment separates them:

  1. tiny jit, 2 small args        -> pure RPC dispatch floor
  2. tiny jit, full params as args -> + pytree marshaling cost
  3. tiny jit, params CLOSED OVER  -> marshaling avoided if constants help

All timings use delta timing (enqueue n, fetch last) per the honest-timing
method in docs/BENCH.md.

Usage: python tools/exp_dispatch.py [n_calls]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def fetch_sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def timed(fn, n, *args):
    fn(*args)  # warm
    fetch_sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    fetch_sync(out)
    return (time.perf_counter() - t0) / n


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    jax.config.update("jax_compilation_cache_dir", "/tmp/gswm-jax-cache")
    print("devices:", jax.devices())

    from gswm.pipelines import InversablePipeline

    pipe = InversablePipeline("sd-2-1-base", rng=jax.random.key(0))
    params = pipe.unet_params
    leaves = jax.tree.leaves(params)
    print(f"params: {len(leaves)} leaves, "
          f"{sum(l.size for l in leaves)/1e6:.1f}M elements")

    x = jnp.ones((8, 8))

    @jax.jit
    def tiny(a, b):
        return a + b

    t = timed(tiny, n, x, x)
    print(f"tiny jit, 2 small args:      {t*1e3:8.2f} ms/call")

    @jax.jit
    def tiny_params(p, a):
        return a + jax.tree.leaves(p)[0][0, 0]

    t = timed(tiny_params, n, params, x)
    print(f"tiny jit, params as args:    {t*1e3:8.2f} ms/call")

    @jax.jit
    def tiny_closed(a):
        return a + jax.tree.leaves(params)[0][0, 0]

    t = timed(tiny_closed, n, x)
    print(f"tiny jit, params closed:     {t*1e3:8.2f} ms/call")

    # eager op chain: k single eager adds per call
    def eager_chain(a):
        for _ in range(10):
            a = a + 1.0
        return a

    t = timed(eager_chain, n, x)
    print(f"10 eager ops:                {t*1e3:8.2f} ms/call "
          f"({t*1e2:.2f} ms/op)")


if __name__ == "__main__":
    main()
