"""In-context attention entry A/B: what do the layouts around the flash
kernel really cost inside a scanned graph?

Round-3 trace finding: the model's qkv-projection -> split -> to_bhsd ->
kernel -> merge chain materializes ~2.5 s/pass of {1,2,0}->{2,1,0} copies
(data-formatting bucket) that round-2's ISOLATED kernel micro-bench could
not see — with random-array inputs XLA folds the transposes into the
custom-call operand layout, but with a real matmul producer it cannot.
This harness reproduces the context (projection producer + to_out consumer
+ residual, inside lax.scan like the UNet) and measures:

  floor     x -> to_out matmul only (no attention at all)
  current   fused qkv matmul -> split -> heads reshape -> flash_attention
            -> merge -> to_out (the shipped model path)
  separate  three separate q/k/v matmuls -> same flash path (does unfusing
            let XLA pick layouts that kill the copies?)
  fusedk    flash_attention_fused_qkv: projections inside the kernel,
            (B,S,C) in / (B,S,HD) out, no relayout anywhere

    python tools/exp_attn_context.py [lvl0|lvl1|lvl0_768]
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
    flash_attention,
    flash_attention_cres,
    flash_attention_fused_qkv,
    flash_attention_packed,
    flash_attention_transposed,
)

SHAPES = {
    # (batch, seq, channels, heads, head_dim)
    "lvl0": (160, 4096, 320, 5, 64),
    "lvl1": (160, 1024, 640, 10, 64),
    "lvl2": (160, 256, 1280, 20, 64),
    "lvl0_768": (32, 9216, 320, 5, 64),
    "lvl1_768": (32, 2304, 640, 10, 64),
    "lvl2_768": (32, 576, 1280, 20, 64),
    "sdxl_lvl1": (2, 4096, 1280, 20, 64),
}


def make_fn(variant, b, s, c, h, d):
    inner = h * d
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    wqkv = (jax.random.normal(k1, (c, 3 * inner)) * 0.05).astype(jnp.bfloat16)
    wout = (jax.random.normal(k2, (inner, c)) * 0.05).astype(jnp.bfloat16)
    x0 = jax.random.normal(k3, (b, s, c)).astype(jnp.bfloat16)

    def attn(x):
        if variant == "floor":
            o = x[..., :inner] if inner < c else jnp.pad(
                x, ((0, 0), (0, 0), (0, inner - c)))
            return o, wout
        if variant == "fusedk":
            return flash_attention_fused_qkv(
                x, wqkv[:, :inner], wqkv[:, inner:2 * inner],
                wqkv[:, 2 * inner:], h, d), wout
        if variant == "packed":
            # pair-packed: one qkv matmul with weight-padded head pairs,
            # row-padded to_out — the shipped routing for s > 2304
            pairs = -(-h // 2)
            cpk = pairs * 128

            def padw(w):
                return w if cpk == inner else jnp.pad(
                    w, ((0, 0), (0, cpk - inner)))

            wp = jnp.concatenate(
                [padw(wqkv[:, :inner]), padw(wqkv[:, inner:2 * inner]),
                 padw(wqkv[:, 2 * inner:])], axis=1)
            o = flash_attention_packed(jnp.dot(x, wp), d)
            wo = wout if cpk == inner else jnp.pad(
                wout, ((0, cpk - inner), (0, 0)))
            return o, wo
        if variant == "transposed":
            # projection emits (3N, B, S) natively; the kernel reads three
            # index-mapped views of it (no split, no relayout), and to_out
            # consumes the (N, B, S) output in place
            qkvT = jnp.einsum("nc,bsc->nbs", wqkv.T, x)
            oT = flash_attention_transposed(qkvT, h, d)
            return jnp.einsum("nbs,nc->bsc", oT, wout), None
        if variant == "cres":
            # channel-resident: three separate matmuls feed the kernel in
            # their native (B,S,C) layout; K/V weight columns zero-padded
            # to the 128-lane DMA boundary; to_out consumes (B,S,HD)
            pad = (-inner) % 128

            def padc(w):
                return w if pad == 0 else jnp.pad(w, ((0, 0), (0, pad)))

            q = jnp.dot(x, wqkv[:, :inner])
            k = jnp.dot(x, padc(wqkv[:, inner:2 * inner]))
            v = jnp.dot(x, padc(wqkv[:, 2 * inner:]))
            return flash_attention_cres(q, k, v, h, d), wout
        if variant == "xf":
            # plain-XLA flash (round 5): three separate UNPADDED matmuls,
            # the dot chain fused by XLA's windowed emitter, to_out in place
            from gswm.ops.attention import xla_flash_attention

            q = jnp.dot(x, wqkv[:, :inner])
            k = jnp.dot(x, wqkv[:, inner:2 * inner])
            v = jnp.dot(x, wqkv[:, 2 * inner:])
            return xla_flash_attention(q, k, v, h, d), wout
        if variant == "current":
            qkv = jnp.dot(x, wqkv)
            q, k, v = jnp.split(qkv, [inner, 2 * inner], axis=-1)
        else:  # separate
            q = jnp.dot(x, wqkv[:, :inner])
            k = jnp.dot(x, wqkv[:, inner:2 * inner])
            v = jnp.dot(x, wqkv[:, 2 * inner:])
        def heads(t):
            return t.reshape(b, s, h, d)
        o = flash_attention(heads(q), heads(k), heads(v))
        return o.reshape(b, s, inner), wout

    @jax.jit
    def run(x0, wqkv, wout):
        def step(x, _):
            o, w = attn(x)
            if w is not None:
                o = jnp.dot(o, w)
            return (x + 0.1 * o).astype(x.dtype), ()

        y, _ = jax.lax.scan(step, x0, None, length=4)
        return jnp.sum(y.astype(jnp.float32))

    return lambda: run(x0, wqkv, wout)


def delta_time(fn, n1=3, n2=9):
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
    names = sys.argv[1:] or ["lvl0", "lvl1"]
    for name in names:
        b, s, c, h, d = SHAPES[name]
        print(f"{name}: (b={b}, s={s}, c={c}, h={h}, d={d})", flush=True)
        base = None
        variants = ["floor", "current", "separate", "cres", "fusedk",
                    "packed", "transposed", "xf"]
        import os
        if os.environ.get("GSWM_CTX_VARIANTS"):
            variants = os.environ["GSWM_CTX_VARIANTS"].split(",")
        for variant in variants:
            try:
                fn = make_fn(variant, b, s, c, h, d)
                t = delta_time(fn) / 4
                msg = f"  {variant:9s} {t*1e3:8.2f} ms/step"
                if variant == "floor":
                    base = t
                elif base is not None:
                    msg += f"  (attention in context: {1e3*(t-base):7.2f} ms)"
                print(msg, flush=True)
            except Exception as e:
                print(f"  {variant:9s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
