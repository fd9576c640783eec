"""Attribute the lvl0 flash kernel's 84-vs-116.5 TF/s residual (VERDICT r4 #1).

The cres kernel's effective rate at SD lvl0 (b160, 4096 tokens, 5 heads,
d=64, blocks (512,2048)) is ~84-89 TF/s while the bare-XLA alternating
qkT+PV chain measured 116.5 TF/s (tools/bench_sol.py).  Round 4 falsified
the softmax-SERIALIZATION theory (exp2 / pv-chunk knobs were ties).  The
two remaining suspects, measured here:

  (a) the achievable d=64 dot rate UNDER A REAL PALLAS GRID at the
      kernel's tile shapes — the 116.5 cap was a bare dot chain where XLA
      owns the whole schedule; Mosaic at (512,64)x(64,2048) +
      (512,2048)x(2048,64) tiles may top out lower;
  (b) the VPU element-pass cost over the fp32 logits tile (exp, row-sum,
      bf16 cast) — per kernel pass that is b*h*s^2 = 13.4G logits; even a
      perfectly-overlapped VPU can only hide behind the MXU if its pass
      time is below the dot time.

Kernel-variant rows (fresh subprocess each — the module jit caches don't
key on the monkeypatched loop body):

  full   the production kernel (gswm.ops.attention.flash_attention_cres)
  dots   same grid/DMA/heads structure, body = qkT -> bf16 cast -> PV
         (softmax stripped).  The Pallas-achievable MXU ceiling.
  qkt    qkT only (PV and softmax stripped; result consumed via two
         narrow column slices so Mosaic cannot drop the dot).
  ones   production softmax but the row-sum l folded into the PV matmul
         via a ones-column in V (candidate fix: kills the VPU sum pass).

Pass-rate rows (in-process, one (512,2048) fp32 tile in VMEM, op looped
in-kernel):  mul / cast / exp / sum / softmax-tail (the full non-dot body).

XLA control row:  the bench_sol qkT+PV chain re-run at the KERNEL's tile
granularity (M=512 q tiles instead of the whole 4096 sequence).

Verdict logic printed at the end:
  full ~= dots           -> MXU-bound under Mosaic: re-denominate SOL with
                            the measured `dots` rate (docs/BENCH.md).
  full ~= dots + passes  -> VPU serializes after all: attack the passes.
  full ~= max(...)       -> overlapped but VPU-bound: reduce passes (ones).

Usage:  python tools/exp_kernel_rate.py            # everything
        python tools/exp_kernel_rate.py --child VARIANT   # internal
"""

from __future__ import annotations

import functools
import os
import subprocess
import sys
import time

B, S, C, H, D = 160, 4096, 320, 5, 64
C_KV = 384          # k/v channel pad (128 multiple)
BQ, BK = 512, 2048  # the shipped lvl0 cres blocks
ATT_FLOPS = 4.0 * B * H * S * S * D          # qkT + PV
QKT_FLOPS = 2.0 * B * H * S * S * D
LOGITS_ELEMS = float(B * H) * S * S          # per elementwise pass


def _delta_time(fn, n1=3, n2=9, warm=2):
    import numpy as np
    import jax

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return time.perf_counter() - t0

    run(warm)
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1)


# ---------------------------------------------------------------- variants
def _loop_dots(q, k_get, v_get, *, block_k, valid_k, use_max, seq_k=None):
    """qkT -> bf16 cast -> PV; softmax stripped.  Same dots, same dtypes."""
    import jax
    import jax.numpy as jnp
    block_q, d = q.shape
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(kb, acc):
        k = k_get(kb)
        v = v_get(kb)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        p = s.astype(v.dtype)
        return acc + jnp.dot(p, v, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, seq_k // block_k, body, acc0)
    return acc * (1.0 / seq_k)


def _loop_qkt(q, k_get, v_get, *, block_k, valid_k, use_max, seq_k=None):
    """qkT only; two distant column slices consumed so the dot survives."""
    import jax
    import jax.numpy as jnp
    block_q, d = q.shape
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(kb, acc):
        k = k_get(kb)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        return acc + s[:, :d] + s[:, block_k // 2:block_k // 2 + d]

    acc = jax.lax.fori_loop(0, seq_k // block_k, body, acc0)
    return acc * (1.0 / seq_k)


def _loop_ones(q, k_get, v_get, *, block_k, valid_k, use_max, seq_k=None):
    """Production no-max softmax, but the row-sum l is computed by the MXU:
    a ones column is concatenated onto V so l rides the SAME PV dot's
    N-tile (64->65 lanes, still one 128-lane MXU tile — no extra passes)
    instead of a VPU reduce pass over the logits tile.  The per-iter
    concat is a (block_k, 65) lane copy, ~1/16 of one logits pass; the
    production version would bake the ones into v_vmem's zero pad lanes."""
    import jax
    import jax.numpy as jnp
    block_q, d = q.shape
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    clamp = 60.0

    def body(kb, carry):
        l, acc = carry
        k = k_get(kb)
        v = v_get(kb)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        p = jnp.exp(jnp.minimum(s, clamp)).astype(v.dtype)
        ones = jnp.ones((block_k, 1), v.dtype)
        pv_in = jnp.concatenate([v, ones], axis=1)
        r = jnp.dot(p, pv_in, preferred_element_type=jnp.float32)
        return l + r[:, d:d + 1], acc + r[:, :d]

    l, acc = jax.lax.fori_loop(0, seq_k // block_k, body, (l0, acc0))
    return acc / l


def _loop_dotsb(q, k_get, v_get, *, block_k, valid_k, use_max, seq_k=None):
    """qkT emitting bf16 DIRECTLY from the MXU -> PV.  vs `dots`: isolates
    the explicit fp32->bf16 relayout cast of the logits tile."""
    import jax
    import jax.numpy as jnp
    block_q, d = q.shape
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(kb, acc):
        k = k_get(kb)
        v = v_get(kb)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.bfloat16)
        return acc + jnp.dot(s, v, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, seq_k // block_k, body, acc0)
    return acc * (1.0 / seq_k)


def _loop_fullb(q, k_get, v_get, *, block_k, valid_k, use_max, seq_k=None):
    """Candidate production fix: bf16 logits end to end.  qkT emits bf16,
    exp/clamp run on the packed bf16 tile (register-local up/down convert,
    no cross-vreg relayout), row-sum accumulates into the fp32 l carry."""
    import jax
    import jax.numpy as jnp
    block_q, d = q.shape
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    clamp = jnp.bfloat16(60.0)

    def body(kb, carry):
        l, acc = carry
        k = k_get(kb)
        v = v_get(kb)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.bfloat16)
        p = jnp.exp(jnp.minimum(s, clamp))
        l = l + jnp.sum(p, axis=-1, keepdims=True,
                        dtype=jnp.float32)
        return l, acc + jnp.dot(p, v, preferred_element_type=jnp.float32)

    l, acc = jax.lax.fori_loop(0, seq_k // block_k, body, (l0, acc0))
    return acc / l


def _loop_pvo(q, k_get, v_get, *, block_k, valid_k, use_max, seq_k=None):
    """PV only: p is a lane-broadcast bf16 tile (no fp32 cast, no qkT).
    The bare Mosaic rate of the (512,2048)x(2048,64) PV dot."""
    import jax
    import jax.numpy as jnp
    block_q, d = q.shape
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    qb = q.astype(jnp.bfloat16)

    def body(kb, acc):
        v = v_get(kb)
        p = jnp.broadcast_to(qb[:, kb % d][:, None], (block_q, block_k))
        return acc + jnp.dot(p, v, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, seq_k // block_k, body, acc0)
    return acc * (1.0 / seq_k)


_VARIANTS = {"dots": _loop_dots, "qkt": _loop_qkt, "ones": _loop_ones,
             "dotsb": _loop_dotsb, "fullb": _loop_fullb, "pvo": _loop_pvo}


def child(variant: str) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/gswm-jax-cache-kr-{variant}")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import gswm.ops.attention as A

    if variant != "full":
        A._attend_kv_loop = _VARIANTS[variant]

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q0 = (jax.random.normal(k1, (B, S, H * D)) * 0.3).astype(jnp.bfloat16)
    k = (jax.random.normal(k2, (B, S, C_KV)) * 0.3).astype(jnp.bfloat16)
    v = (jax.random.normal(k3, (B, S, C_KV)) * 0.3).astype(jnp.bfloat16)
    n = 8

    # k/v are ARGUMENTS, not closure constants: closed-over arrays embed in
    # the jaxpr and blow the tunnel's remote-compile request-body limit
    # (HTTP 413 at 2 x 210MB on the first draft of this tool).
    @jax.jit
    def go(q, k, v):
        def body(carry, _):
            o = A.flash_attention_cres(carry, k, v, H, D,
                                       block_q=BQ, block_k=BK)
            # tanh keeps the chain bounded for every variant (dots/qkt emit
            # unnormalized sums); one 200M-elem pass, ~0.5% of the kernel.
            o = jnp.tanh(o.astype(jnp.float32) * 0.5).astype(jnp.bfloat16)
            return o, ()

        y, _ = jax.lax.scan(body, q, None, length=n)
        return jnp.float32(y.astype(jnp.float32).sum())

    t = _delta_time(lambda: go(q0, k, v)) / n
    flops = QKT_FLOPS if variant in ("qkt", "pvo") else ATT_FLOPS
    print(f"RESULT {t * 1e3:.3f} {flops / t / 1e12:.2f}", flush=True)


# ------------------------------------------------------------- pass rates
def pass_rates() -> dict:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 256
    # (512,1024) fp32, not the kernel's full (512,2048): Mosaic buffers the
    # in block + loop carry + body temporaries, and the full tile blows the
    # 16MB scoped-vmem ceiling (measured: 19.79M for even the mul loop).
    # Per-ELEMENT VPU rates are tile-size independent at this granularity;
    # the printed all-logits totals rescale by element count regardless.
    bk = BK // 2
    elems = BQ * bk

    def make(op):
        def kernel(x_ref, o_ref):
            def body(i, x):
                if op == "mul":
                    return x * 1.0000001
                if op == "cast":
                    return (x.astype(jnp.bfloat16).astype(jnp.float32)
                            * 1.0000001)
                if op == "exp":
                    return jnp.exp(jnp.minimum(x, 1.0)) * 0.60653066
                if op == "sum":
                    return (x * 0.9999
                            + jnp.sum(x, axis=-1, keepdims=True) * 1e-9)
                if op == "tail":
                    # the production body minus the dots: clamp+exp (one
                    # fused chain), bf16 cast for PV, row-sum for l
                    p = jnp.exp(jnp.minimum(x, 1.0))
                    pb = p.astype(jnp.bfloat16)
                    l = jnp.sum(p, axis=-1, keepdims=True)
                    return (x * 0.9999 + pb.astype(jnp.float32) * 1e-6
                            + l * 1e-9)
                raise ValueError(op)

            y = jax.lax.fori_loop(0, n, body, x_ref[...])
            o_ref[...] = y[:8, :128]  # small output: only the carry is big

        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )

    x = jax.random.normal(jax.random.key(7), (BQ, bk), jnp.float32) * 0.1
    out = {}
    for op in ("mul", "cast", "exp", "sum", "tail"):
        f = jax.jit(make(op))
        t = _delta_time(lambda f=f: f(x)) / n
        gels = elems / t / 1e9
        # time for one such pass over ALL lvl0 logits (13.4G elems)
        total_ms = LOGITS_ELEMS / (gels * 1e9) * 1e3
        out[op] = (gels, total_ms)
        print(f"  pass {op:5s} {t * 1e6:8.2f} us/tile   {gels:8.1f} Gelem/s"
              f"   -> {total_ms:7.1f} ms over all lvl0 logits", flush=True)
    return out


def xla_tile_mix() -> float:
    """bench_sol's qkT+PV chain at the kernel's M=512 tile granularity."""
    import jax
    import jax.numpy as jnp

    bh = B * H
    q0 = jax.random.normal(jax.random.key(1), (bh, BQ, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(2), (bh, BK, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(3), (bh, BK, D), jnp.bfloat16)
    n = 64

    # k/v as arguments — see child() for the HTTP-413 constant-size trap
    @jax.jit
    def go(q, k, v):
        def body(c, _):
            p = jax.lax.dot_general(
                c, k, (((2,), (2,)), ((0,), (0,)))).astype(jnp.bfloat16)
            o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))))
            return (o * 1e-3).astype(jnp.bfloat16), ()

        y, _ = jax.lax.scan(body, q, None, length=n)
        return jnp.float32(y.astype(jnp.float32).sum())

    t = _delta_time(lambda: go(q0, k, v)) / n
    flops = 4.0 * bh * BQ * BK * D
    tf = flops / t / 1e12
    print(f"  xla mix @ (512,64)x(64,2048) tiles: {t * 1e3:7.3f} ms/iter  "
          f"{tf:6.1f} TF/s", flush=True)
    return tf


def xla_pv_only() -> float:
    """XLA's bare (512,2048)x(2048,64) PV dot rate: a p->o->p chain where
    the (512,2048) bf16 p carry is refreshed by a cheap rank-1 broadcast
    of o so the PV dot is the only real work."""
    import jax
    import jax.numpy as jnp

    bh = B * H
    p0 = jax.random.normal(jax.random.key(4), (bh, BQ, BK), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(5), (bh, BK, D), jnp.bfloat16)
    n = 64

    @jax.jit
    def go(p, v):
        def body(c, _):
            o = jax.lax.dot_general(c, v, (((2,), (1,)), ((0,), (0,))))
            c2 = jax.lax.broadcast_in_dim(
                (o[:, :, :1] * 1e-3).astype(jnp.bfloat16),
                (bh, BQ, BK), (0, 1, 2))
            return c2, ()

        y, _ = jax.lax.scan(body, p, None, length=n)
        return jnp.float32(y.astype(jnp.float32).sum())

    t = _delta_time(lambda: go(p0, v)) / n
    flops = 2.0 * bh * BQ * BK * D
    tf = flops / t / 1e12
    print(f"  xla PV-only @ (512,2048)x(2048,64): {t * 1e3:7.3f} ms/iter  "
          f"{tf:6.1f} TF/s", flush=True)
    return tf


def main() -> None:
    if sys.argv[1:2] == ["--child"]:
        child(sys.argv[2])
        return

    sections = set(sys.argv[1:]) or {"passes", "kernels", "xla"}

    import jax
    print(f"devices: {jax.devices()}", flush=True)
    print(f"lvl0 shape b={B} s={S} h={H} d={D}, blocks ({BQ},{BK}); "
          f"attention {ATT_FLOPS / 1e12:.2f} TFLOP/call", flush=True)

    passes = {}
    if "passes" in sections:
        print("VPU pass rates on the (512,2048) fp32 logits tile:",
              flush=True)
        passes = pass_rates()

    if "kernels" in sections:
        print("kernel variants (fresh subprocess each):", flush=True)
        _run_kernels(passes)

    if "xla" in sections:
        print("XLA control:", flush=True)
        xla_tile_mix()
        xla_pv_only()


def _run_kernels(passes: dict) -> None:
    rows = {}
    variants = ("full", "dots", "qkt", "ones", "dotsb", "fullb", "pvo")
    if os.environ.get("GSWM_KR_VARIANTS"):
        variants = tuple(os.environ["GSWM_KR_VARIANTS"].split(","))
    for variant in variants:
        proc = subprocess.run(
            [sys.executable, __file__, "--child", variant],
            env=os.environ, capture_output=True, text=True, timeout=1800)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("RESULT")]
        if proc.returncode or not line:
            print(f"  {variant:5s} FAILED\n{proc.stderr[-800:]}", flush=True)
            continue
        ms, tf = (float(x) for x in line[0].split()[1:3])
        rows[variant] = (ms, tf)
        print(f"  {variant:5s} {ms:8.2f} ms/call  {tf:6.1f} TF/s effective",
              flush=True)

    if "full" in rows and "dots" in rows:
        full_ms, dots_ms = rows["full"][0], rows["dots"][0]
        tail_ms = passes.get("tail", (0, 0))[1]
        print(f"\nverdict inputs: full={full_ms:.1f} dots={dots_ms:.1f} "
              f"tail-pass-est={tail_ms:.1f} "
              f"dots+tail={dots_ms + tail_ms:.1f} "
              f"max={max(dots_ms, tail_ms):.1f} (ms)", flush=True)


if __name__ == "__main__":
    main()
