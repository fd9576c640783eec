"""A/B the round-4 kernel-rate experiments against the shipped kernels.

The lvl0 flash kernel runs at ~84 TF/s effective vs the measured 116.5
TF/s d=64 matmul-mix cap (docs/BENCH.md round 4) — the residual is
in-kernel softmax work serializing against the MXU.  Two env-gated
candidates attack it:

  exp2   GSWM_ATTN_EXP2=1        base-2 softmax, log2(e) folded into the
                                 Q scale (kills exp's internal per-logit
                                 ln2 multiply)
  pvN    GSWM_ATTN_PV_CHUNKS=N   chunked exp+PV tail (VPU/MXU overlap)

Env is read at trace time and the module jit caches don't key on it, so
each combo runs in a FRESH subprocess (same-process toggling would
silently reuse stale kernels).  The child reuses exp_attn_context's
in-context harness (projection producer + to_out consumer inside
lax.scan) — the measurement that caught the round-3 relayout costs an
isolated micro-bench could not see.

    python tools/exp_attn_sched.py [lvl0] [lvl0_768] ...
"""

from __future__ import annotations

import os
import subprocess
import sys

COMBOS = [
    ("baseline", {}),
    ("exp2", {"GSWM_ATTN_EXP2": "1"}),
    ("pv2", {"GSWM_ATTN_PV_CHUNKS": "2"}),
    ("pv4", {"GSWM_ATTN_PV_CHUNKS": "4"}),
    ("exp2+pv2", {"GSWM_ATTN_EXP2": "1", "GSWM_ATTN_PV_CHUNKS": "2"}),
    ("exp2+pv4", {"GSWM_ATTN_EXP2": "1", "GSWM_ATTN_PV_CHUNKS": "4"}),
]

# shape -> harness variant that matches the shipped routing there
VARIANTS = {"lvl0": "cres", "lvl1": "fusedk", "lvl0_768": "current",
            "sdxl_lvl1": "cres"}


def child(shape: str, variant: str) -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "exp_attn_context",
        os.path.join(os.path.dirname(__file__), "exp_attn_context.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    b, s, c, h, d = mod.SHAPES[shape]
    fn = mod.make_fn(variant, b, s, c, h, d)
    t = mod.delta_time(fn) / 4
    print(f"RESULT {t * 1e3:.2f}", flush=True)


def main() -> None:
    if sys.argv[1:2] == ["--child"]:
        child(sys.argv[2], sys.argv[3])
        return
    shapes = sys.argv[1:] or ["lvl0"]
    for shape in shapes:
        variant = VARIANTS.get(shape, "cres")
        print(f"{shape} ({variant}):", flush=True)
        base = None
        for name, env in COMBOS:
            proc = subprocess.run(
                [sys.executable, __file__, "--child", shape, variant],
                env={**os.environ, **env}, capture_output=True, text=True,
                timeout=1200)
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("RESULT")]
            if proc.returncode or not line:
                print(f"  {name:9s} FAILED\n{proc.stderr[-500:]}", flush=True)
                continue
            ms = float(line[0].split()[1])
            if name == "baseline":
                base = ms
            delta = "" if base is None or name == "baseline" else (
                f"  ({(ms - base) / base * 100:+.1f}% vs baseline)")
            print(f"  {name:9s} {ms:8.2f} ms/step{delta}", flush=True)


if __name__ == "__main__":
    main()
