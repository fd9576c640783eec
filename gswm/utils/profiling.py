"""Tracing / profiling hooks (SURVEY.md §5: absent in the reference beyond
tqdm bars; required here for speed-of-light work).

  * ``stage`` — wall-clock timer per pipeline stage (embed / vae / unet-loop
    / decode) with a process-global report.
  * ``trace`` — jax.profiler context producing a TensorBoard/XProf trace.
  * ``device_stats`` — live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax

_STAGES: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def stage(name: str, sync: bool = True):
    """Time a pipeline stage; ``sync`` blocks on async dispatch so the number
    means device time, not enqueue time."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            try:
                jax.block_until_ready(jax.device_put(0.0))
            except Exception:
                pass
        _STAGES[name].append(time.perf_counter() - t0)


def stage_report(reset: bool = False) -> dict:
    rep = {
        name: {
            "count": len(ts),
            "total_s": round(sum(ts), 4),
            "mean_s": round(sum(ts) / len(ts), 4),
        }
        for name, ts in _STAGES.items()
        if ts
    }
    if reset:
        _STAGES.clear()
    return rep


def print_stage_report(reset: bool = False):
    print(json.dumps(stage_report(reset=reset), indent=2))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gswm-trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_stats() -> list[dict]:
    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
            out.append({
                "device": str(d),
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            })
        except Exception:
            out.append({"device": str(d)})
    return out
