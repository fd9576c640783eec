"""BASELINE config 5 as ONE recorded end-to-end artifact (VERDICT r2 next
#7): 10k-image multi-key embed -> DP-sharded decode over the virtual
8-device mesh -> gs-trace attribution, one pipeline, one jsonl.

The serving story: every image in a 10k batch carries its own
key/nonce/message (per-user traceability, BASELINE config 5).  The pieces
(gswm.core.multikey, gswm.eval.trace) each had their own benchmarks; this
driver runs them AS ONE PIPELINE and records the result:

  phase 1  embed    10k latents, per-image keys (vmapped ChaCha keystreams)
  phase 2  decode   all 10k latents under their own keys, batch-DP-sharded
                    over an 8-device mesh (NamedSharding on the batch axis);
                    accuracy vs the registry must be 1.0 for every image
  phase 3  trace    N probe latents attributed against the FULL 10k registry
                    (native C++ path; device path cross-checked on one probe)

Writes benchmarks/config5_multikey_trace.jsonl (one record per phase with
throughput + accuracy) — resume-safe to rerun (overwrites).

Run on the virtual CPU mesh (no TPU needed; keep it off the chip so
benches aren't skewed):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/run_config5_artifact.py
"""

from __future__ import annotations

import json
import os
import secrets
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = "benchmarks/config5_multikey_trace.jsonl"


def main():
    import jax

    if not os.environ.get("GSWM_TEST_TPU"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gswm.config import GSConfig
    from gswm.core import bits as bitops
    from gswm.core.multikey import (
        embed_latents_multikey,
        recover_message_bits_multikey,
    )
    from gswm.eval import trace
    from gswm.sharding import make_mesh

    n_total = int(os.environ.get("GSWM_CONFIG5_N", "10000"))
    chunk = 1000
    n_probes = 16
    rng = __import__("random").Random(0)

    # registry: per-image key/nonce/message (info_data.jsonl schema)
    registry = [{
        "key_hex": rng.randbytes(32).hex(),
        "nonce_hex": rng.randbytes(16).hex(),
        "message_hex": rng.randbytes(32).hex(),
        "message_length": 256,
    } for _ in range(n_total)]
    cfg = GSConfig(key_hex="00" * 32, nonce_hex="00" * 16, message="",
                   width=512, height=512, message_bits=256)

    records = []

    # ---- phase 1: embed (chunked; one jit, re-used across chunks) --------
    t0 = time.perf_counter()
    latents = np.empty((n_total, 4, 64, 64), np.float32)
    for c0 in range(0, n_total, chunk):
        recs = registry[c0:c0 + chunk]
        lat, _ = embed_latents_multikey(
            cfg,
            [bytes.fromhex(r["key_hex"]) for r in recs],
            [bytes.fromhex(r["nonce_hex"]) for r in recs],
            [bytes.fromhex(r["message_hex"]) for r in recs],
            rng=jax.random.key(c0),
        )
        latents[c0:c0 + chunk] = np.asarray(lat)
    dt = time.perf_counter() - t0
    records.append({"phase": "embed_multikey", "images": n_total,
                    "seconds": round(dt, 2),
                    "imgs_per_sec": round(n_total / dt, 1)})
    print(records[-1], flush=True)

    # ---- phase 2: DP-sharded decode over the 8-device mesh ---------------
    n_dev = len(jax.devices())
    mesh = make_mesh(dp=n_dev, tp=1)
    t0 = time.perf_counter()
    all_ok = 0
    with jax.sharding.set_mesh(mesh):
        for c0 in range(0, n_total, chunk):
            recs = registry[c0:c0 + chunk]
            lat_s = jax.device_put(
                latents[c0:c0 + chunk], NamedSharding(mesh, P("dp")))
            voted = np.asarray(recover_message_bits_multikey(
                lat_s, cfg,
                [bytes.fromhex(r["key_hex"]) for r in recs],
                [bytes.fromhex(r["nonce_hex"]) for r in recs]))
            want = np.stack([
                bitops.hex_to_bits(r["message_hex"])[:256] for r in recs])
            all_ok += int(np.sum(np.all(voted == want, axis=1)))
    dt = time.perf_counter() - t0
    records.append({"phase": "decode_dp_sharded", "images": n_total,
                    "mesh_devices": n_dev, "seconds": round(dt, 2),
                    "imgs_per_sec": round(n_total / dt, 1),
                    "exact_decodes": all_ok,
                    "decode_accuracy": all_ok / n_total})
    print(records[-1], flush=True)

    # ---- phase 3: attribution against the full registry ------------------
    probe_idx = [rng.randrange(n_total) for _ in range(n_probes)]
    t0 = time.perf_counter()
    hits = 0
    for i in probe_idx:
        best, acc, _ = trace.find_source(latents[i], registry)
        hits += int(best == i and acc == 1.0)
    dt = time.perf_counter() - t0
    records.append({
        "phase": "trace_native", "probes": n_probes,
        "registry_size": n_total, "seconds": round(dt, 2),
        "candidates_per_sec": round(n_probes * n_total / dt, 1),
        "correct_attributions": hits})
    print(records[-1], flush=True)

    # device path cross-check on one probe
    t0 = time.perf_counter()
    best, acc, _ = trace.find_source_device(latents[probe_idx[0]], registry)
    dt = time.perf_counter() - t0
    records.append({"phase": "trace_device", "probes": 1,
                    "registry_size": n_total, "seconds": round(dt, 2),
                    "correct": bool(best == probe_idx[0] and acc == 1.0)})
    print(records[-1], flush=True)

    assert all_ok == n_total, "DP decode must be exact for every image"
    assert hits == n_probes, "every probe must attribute to its true record"

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
