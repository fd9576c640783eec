"""bench.py must never crash at the driver's end-of-round run.

Runs the full bench flow (embed + N-step inversion + decode, pipelined-pass
protocol) on the tiny preset in a subprocess pinned to CPU, and checks the
JSON contract the driver records (metric/value/unit/vs_baseline/protocol).
"""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_tiny_cpu_emits_contract_json():
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import bench; bench.main()"
    )
    env = dict(
        os.environ,
        GSWM_BENCH_PRESET="tiny", GSWM_BENCH_BATCH="4",
        GSWM_BENCH_STEPS="2", GSWM_BENCH_RES="64",
        GSWM_BENCH_FORCE_BATCH="1",
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["unit"] == "imgs/sec/chip"
    assert rec["value"] > 0
    assert "vs_baseline" in rec and "protocol" in rec
    assert "extract throughput" in rec["metric"]
