"""Benchmark attribution (gs_trace / find_source) at 10k-registry scale
(BASELINE config 5; VERDICT r1 next #9).

Builds a synthetic 10k-record registry (per-record random key/nonce/message,
the info_data.jsonl schema), embeds one latent under a record in the middle,
and times candidates/sec for:
  * native   — C++ per-candidate loop (gswm.native, ctypes)
  * python   — pure-Python/numpy fallback (native disabled)
  * device   — batched ChaCha + vote on the accelerator (find_source_device)

Run:  python tools/bench_trace.py [--n 10000] [--device-only]
"""

from __future__ import annotations

import argparse
import os
import secrets
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_registry(n: int, message_bits: int = 256) -> list[dict]:
    rng = __import__("random").Random(0)
    recs = []
    for _ in range(n):
        recs.append({
            "key_hex": rng.randbytes(32).hex(),
            "nonce_hex": rng.randbytes(16).hex(),
            "message_hex": rng.randbytes(message_bits // 8).hex(),
            "message_length": message_bits,
        })
    return recs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--message-bits", type=int, default=256)
    ap.add_argument("--skip-python", action="store_true",
                    help="skip the slow pure-python baseline")
    args = ap.parse_args()

    import jax
    import numpy as np

    from gswm import native
    from gswm.config import GSConfig
    from gswm.core.embed import embed_latents
    from gswm.eval import trace

    recs = make_registry(args.n, args.message_bits)
    true_idx = args.n // 2
    cfg = GSConfig(
        key_hex=recs[true_idx]["key_hex"],
        nonce_hex=recs[true_idx]["nonce_hex"],
        message=bytes.fromhex(recs[true_idx]["message_hex"]),
        message_bits=args.message_bits, width=512, height=512,
    )
    lat, _ = embed_latents(cfg, rng=jax.random.key(0))
    lat = np.asarray(lat)[0]

    results = {}

    def timed(name, fn, m=None):
        m = m or args.n
        t0 = time.perf_counter()
        best, acc, _ = fn()
        dt = time.perf_counter() - t0
        ok = best == (true_idx if m == args.n else m // 2)
        print(f"{name:8s}: {m} candidates in {dt:.2f}s = "
              f"{m/dt:,.0f} cand/sec  (best={best} acc={acc:.3f} "
              f"{'OK' if ok else 'WRONG'})")
        results[name] = m / dt
        return dt

    print(f"registry: {args.n} records, {args.message_bits}-bit messages, "
          f"latent 4x64x64 ({lat.size} elements)")
    print(f"native available: {native.available()}")

    timed("native", lambda: trace.find_source(lat, recs))
    timed("device", lambda: trace.find_source_device(lat, recs))
    # second device run = jit-cached steady state
    timed("device2", lambda: trace.find_source_device(lat, recs))

    if not args.skip_python:
        lib = native._LIB
        native._LIB = None  # force fallback
        sub = recs[true_idx - 250 : true_idx + 250]
        try:
            timed("python", lambda: trace.find_source(lat, sub), m=500)
        finally:
            native._LIB = lib

    print("\nsummary (candidates/sec):",
          {k: f"{v:,.0f}" for k, v in results.items()})


if __name__ == "__main__":
    main()
