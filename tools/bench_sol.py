"""Measure the speed-of-light denominators used by bench.py — don't derive them.

VERDICT r3 "missing #4": the 6.06 imgs/sec attention-aware speed-of-light
rests on a CLAIMED ~81 TF/s structural cap for head_dim-64 matmuls that was
"verified arithmetically" only.  This tool measures, through the same
tunnel/delta-timing protocol that calibrated the 162 TF/s full-width
roofline (docs/BENCH.md round 2):

  full8192   8192^3 bf16 matmul chain — the full-width reference rate
  qkT_d64    batched (S,64)x(64,S) — the QK^T contraction at head_dim 64
             (contracting dim 64 = half the 128x128 MXU's depth).
             DIAGNOSTIC ONLY: the chain's carry keeps just d columns of the
             logits, and XLA narrows the dot to those columns, so the
             credited FLOPs overcount by S/d — the printed rate can exceed
             chip peak.  The honest denominator is the mix row below.
  pv_d64     batched (S,S)x(S,d) — the PV matmul reading the 0.5 GiB logits
             from HBM each iter (HBM-bound by construction; diagnostic).
  qkT+pv     alternating chain of both with the FULL logits tensor consumed
             by the PV dot (bf16 rounding between the dots blocks
             reassociation) — the shape mix a flash kernel runs, and the
             number the 512^2 SOL derivation uses.
  d128 ctrl  same shapes at head_dim 128 — shows the cap is d=64-specific

S defaults to lvl0's 4096 tokens.  Batch is sized so the logits tensor stays
well under HBM while the grid is large enough to saturate the MXU.

Timing protocol: each jitted call chains enough iterations that the timed
DELTA between n1 and n2 calls is >= ~0.5 s of device work — the first
version of this tool timed ~4 ms deltas against the ~30 ms tunnel RPC
jitter and printed a 265 TF/s "measurement" above the chip's 197 TF/s bf16
peak.  Deltas are repeated and the median taken; the spread is printed so a
noisy row is visible as such.

Usage:  python tools/bench_sol.py [S] [BH]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gswm-jax-cache")


def delta_time(fn, n1=2, n2=6, repeats=3):
    """True device time per call: enqueue n async executions, fetch only the
    last, difference two n values (cancels the ~30 ms tunnel RPC constant).
    Median of `repeats` deltas; returns (seconds_per_call, rel_spread)."""

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return time.perf_counter() - t0

    run(1)  # compile + warm
    deltas = []
    for _ in range(repeats):
        t1 = run(n1)
        t2 = run(n2)
        deltas.append((t2 - t1) / (n2 - n1))
    deltas.sort()
    med = deltas[len(deltas) // 2]
    spread = (deltas[-1] - deltas[0]) / med if med > 0 else float("inf")
    return med, spread


def chain(f, x, n):
    """Run f n times with a data dependence so XLA can't elide iterations."""

    @jax.jit
    def go(x):
        def body(c, _):
            return f(c), ()

        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.float32(y.astype(jnp.float32).sum())

    return lambda: go(x)


def rate(name, flops_per_iter, f, x, est_tf):
    """Time `f` chained; size the chain so one call is ~0.15 s of device work
    at the estimated rate (the delta then spans >= ~0.6 s)."""
    est_iter_s = flops_per_iter / (est_tf * 1e12)
    n = max(4, min(1024, int(0.15 / est_iter_s)))
    t, spread = delta_time(chain(f, x, n))
    t /= n
    tf = flops_per_iter / t / 1e12
    print(f"  {name:26s} {t * 1e3:9.3f} ms/iter   {tf:7.1f} TF/s   "
          f"(chain n={n}, delta spread {spread * 100:.0f}%)", flush=True)
    return tf


def main():
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    bh = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    print(f"devices: {jax.devices()}", flush=True)
    print(f"S={s}, BH={bh} (logits tensor {bh * s * s * 2 / 2**30:.2f} GiB "
          f"bf16)", flush=True)

    # full-width reference (the 162 TF/s calibration shape)
    m = 8192
    a = jax.random.normal(jax.random.key(0), (m, m), jnp.bfloat16)
    full = rate("full8192 (ref roofline)", 2 * m**3,
                lambda c: ((c @ a).astype(jnp.bfloat16) * 1e-2)
                .astype(jnp.bfloat16), a, 170.0)

    results = {"full8192": full}
    for d in (64, 128):
        kq = jax.random.key(1)
        q = jax.random.normal(kq, (bh, s, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(2), (bh, s, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(3), (bh, s, d), jnp.bfloat16)

        # QK^T: (bh, s, d) x (bh, s, d) -> (bh, s, s), contracting over d.
        # DIAGNOSTIC: carry keeps d columns, XLA narrows the dot (see module
        # docstring) — rate is an artifact, printed for completeness only.
        def qkt(c, k=k, d=d):
            p = jax.lax.dot_general(
                c, k, (((2,), (2,)), ((0,), (0,)))).astype(jnp.bfloat16)
            return (p[..., :d] * 1e-3).astype(jnp.bfloat16)

        results[f"qkT_d{d}"] = rate(
            f"qkT d={d} (diag)", 2 * bh * s * s * d, qkt, q, 100.0)

        # PV: (bh, s, s) x (bh, s, d) -> (bh, s, d), contracting over s.
        # DIAGNOSTIC: reads the 0.5 GiB logits tensor from HBM every iter,
        # so this row measures HBM bandwidth, not the MXU (a flash kernel
        # keeps the logits tile in VMEM).
        p0 = jax.random.normal(jax.random.key(4), (bh, s, s), jnp.bfloat16)

        def pv(c, v=v):
            o = jax.lax.dot_general(
                c, v, (((2,), (1,)), ((0,), (0,))))
            return (c + 1e-6 * o[..., :1]).astype(jnp.bfloat16)

        results[f"pv_d{d}"] = rate(
            f"PV  d={d} (diag, HBM)", 2 * bh * s * s * d, pv, p0, 30.0)

        # alternating qkT+pv chain — the flash kernel's actual shape mix.
        # The FULL (bh, s, s) logits feed the PV dot and the bf16 rounding
        # between the dots blocks (c@kT)@v -> c@(kT@v) reassociation, so
        # every credited FLOP is executed.  THIS is the SOL denominator.
        def both(c, k=k, v=v):
            p = jax.lax.dot_general(
                c, k, (((2,), (2,)), ((0,), (0,)))).astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))))
            return (o * 1e-3).astype(jnp.bfloat16)

        results[f"mix_d{d}"] = rate(
            f"qkT+PV d={d}", 4 * bh * s * s * d, both, q, 90.0)

    # Derived speed-of-light for the 512^2/30-step headline, using the
    # measured mix_d64 rate as the attention denominator (docs/BENCH.md
    # round 3: 20.4 TFLOPs non-attention + 3.2 TFLOPs self-attention per
    # image at 512x512/30 steps).
    att = results.get("mix_d64", 0.0)
    if att and full and s == 4096:
        per_img = 20.4e12 / (full * 1e12) + 3.2e12 / (att * 1e12)
        sol = 1.0 / per_img
        print(f"\nmeasured attention-aware SOL at 512^2/30-step: "
              f"{sol:.2f} imgs/sec/chip "
              f"(non-attn @ {full:.0f} TF/s, attn @ {att:.1f} TF/s)",
              flush=True)
        # Persist the measured denominators so bench.py's pct_of_* fields
        # derive from a measurement, not arithmetic (VERDICT r3 missing #4).
        out = os.path.join(os.path.dirname(__file__), "..",
                           "benchmarks", "sol_denominators.json")
        with open(out, "w") as f:
            json.dump({
                "full_matmul_tf": round(full, 1),
                "attn_mix_d64_tf": round(att, 1),
                "sol_512_30step_imgs_per_sec": round(sol, 3),
                "tool": "tools/bench_sol.py",
                "shapes": {"S": s, "BH": bh},
            }, f, indent=1)
        print(f"wrote {os.path.normpath(out)}", flush=True)


if __name__ == "__main__":
    main()
