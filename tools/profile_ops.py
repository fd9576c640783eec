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
    """Bucket by the profiler's own hlo_category — NOT the op name.

    Round-3 lesson: name-based classification mislabeled
    ``convert_reduce_fusion.*`` ops (3x3 convs with the following
    GroupNorm's stats fused into their epilogues, running at 142 TF/s) as
    slow norm reduces and sent a whole optimization effort down the wrong
    path (docs/BENCH.md "CORRECTION").  The emitted chrome trace carries
    ``hlo_category`` and ``model_flops`` per op — trust those."""
    cat = (args or {}).get("hlo_category")
    if cat:
        return cat
    if name.startswith("while"):
        return "while-wrapper"
    return "?"


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
    flops = collections.Counter()
    byts = collections.Counter()
    sample_args = {}
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") == dev_pid
                and e.get("tid") in ops_tids):
            name = e["name"]
            if name.startswith("while"):
                continue  # outer loop wrappers double-count their bodies
            a = e.get("args") or {}
            agg[name] += e["dur"]
            cnt[name] += 1
            flops[name] += int(a.get("model_flops", 0) or 0)
            byts[name] += int(a.get("bytes_accessed", 0) or 0)
            sample_args.setdefault(name, a)
    total = sum(agg.values())
    buckets = collections.Counter()
    bflops = collections.Counter()
    bbytes = collections.Counter()
    for name, d in agg.items():
        c = classify(name, sample_args[name])
        buckets[c] += d
        bflops[c] += flops[name]
        bbytes[c] += byts[name]
    print(f"\ninner device op time: {total/1e6:.2f} s "
          f"({100*total/1e6/wall:.0f}% of wall; gap = host dispatch)")
    print(f"\n== buckets ==\n{'category':26s} {'time':>8s} {'share':>6s} "
          f"{'TF/s':>7s} {'GB/s':>7s}")
    for b, d in buckets.most_common():
        tf = bflops[b] / (d * 1e-6) / 1e12 if d else 0.0
        gb = bbytes[b] / (d * 1e-6) / 1e9 if d else 0.0
        print(f"{b:26s} {d/1e6:8.2f} {100*d/total:5.1f}% {tf:7.1f} {gb:7.0f}")
    print("\n== top 45 ops ==")
    for name, d in agg.most_common(45):
        a = sample_args[name]
        tf = flops[name] / (d * 1e-6) / 1e12 if d else 0.0
        hint = str(a.get("tf_op") or a.get("long_name") or "")[:66]
        print(f"{d/1e6:8.3f} s  n={cnt[name]:6d} {tf:6.1f}TF/s "
              f"{name[:44]:44s} {hint}")


if __name__ == "__main__":
    main()
