"""Op-level TPU profile of the extraction pass: where do the HLO ops spend
device time inside the 30-step inversion scan?

Runs the bench pass once to warm the (persistent-cache) compile, captures a
jax.profiler trace of a second pass, then aggregates the device-side op
events from the emitted Chrome trace and prints the top ops with time,
count, and share — classified into attention / matmul-conv / norm-layout /
other so the end-to-end budget can be attributed without eyeballing xprof.

    python tools/profile_ops.py [batch] [steps]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gswm-jax-cache")
sys.path.insert(0, ".")

from gswm.config import GSConfig  # noqa: E402
from gswm.core.decode import recover_message_bits  # noqa: E402
from gswm.core.embed import embed_latents  # noqa: E402
from gswm.pipelines import InversablePipeline  # noqa: E402

TRACE_DIR = "/tmp/gswm-optrace"


def classify(name: str, args: dict) -> str:
    """Best-effort bucket from the HLO op name + metadata."""
    meta = " ".join(str(v) for v in args.values()) if args else ""
    s = (name + " " + meta).lower()
    if "pallas" in s or "flash" in s or "custom-call" in s:
        return "attention-kernel"
    if "conv" in s:
        return "conv"
    if "dot" in s or "einsum" in s or "matmul" in s:
        return "matmul"
    if any(k in s for k in ("reduce", "rsqrt", "norm", "mean", "variance")):
        return "norm/reduce"
    if any(k in s for k in ("copy", "bitcast", "transpose", "reshape",
                            "broadcast", "convert", "pad", "slice",
                            "concatenate")):
        return "layout/copy"
    return "other"


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    res = int(os.environ.get("GSWM_PROF_RES", "512"))

    pipe = InversablePipeline("sd-2-1-base", rng=jax.random.key(0))
    cfg = GSConfig(key_hex="22" * 32, nonce_hex="33" * 16, message="prof",
                   width=res, height=res, message_bits=256)
    images = jax.random.uniform(jax.random.key(99), (batch, 3, res, res))

    def one_pass(rng):
        zT, _ = embed_latents(cfg, rng=rng, batch=batch)
        z_back = pipe.invert(images=images, num_steps=steps)
        bits = recover_message_bits(z_back, cfg)
        return np.asarray(bits), np.asarray(zT[:, 0, 0, 0])

    t0 = time.perf_counter()
    one_pass(jax.random.key(1))
    print(f"warmup (compile or cache load): {time.perf_counter()-t0:.1f}s",
          flush=True)

    with jax.profiler.trace(TRACE_DIR):
        t0 = time.perf_counter()
        one_pass(jax.random.key(2))
        wall = time.perf_counter() - t0
    print(f"traced pass: {wall:.1f}s ({batch/wall:.3f} imgs/s)", flush=True)

    traces = sorted(glob.glob(TRACE_DIR + "/**/*.trace.json.gz",
                              recursive=True))
    if not traces:
        raise SystemExit("no trace emitted")
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    tnames = {}
    dev_pid = None
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in str(e["args"].get("name", "")):
                dev_pid = e["pid"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"].get("name")
    ops_tids = [tid for (pid, tid), n in tnames.items()
                if pid == dev_pid and n == "XLA Ops"]
    agg = collections.Counter()
    cnt = collections.Counter()
    buckets = collections.Counter()
    sample_args = {}
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") == dev_pid
                and e.get("tid") in ops_tids):
            name = e["name"]
            agg[name] += e["dur"]
            cnt[name] += 1
            sample_args.setdefault(name, e.get("args") or {})
    total = sum(agg.values())
    for name, d in agg.items():
        buckets[classify(name, sample_args[name])] += d
    print(f"\ndevice op time: {total/1e6:.2f} s "
          f"({100*total/1e6/wall:.0f}% of wall)")
    print("\n== buckets ==")
    for b, d in buckets.most_common():
        print(f"{d/1e6:8.2f} s  {100*d/total:5.1f}%  {b}")
    print("\n== top 45 ops ==")
    for name, d in agg.most_common(45):
        a = sample_args[name]
        hint = str(a.get("long_name") or a.get("tf_op") or "")[:70]
        print(f"{d/1e6:8.3f} s  n={cnt[name]:6d}  {name[:60]:60s} {hint}")


if __name__ == "__main__":
    main()
