"""tools/real_checkpoint_gate.py must run end-to-end the day real weights
exist (VERDICT r3 next #9).  Offline we prove the mechanics on the
synthesized tiny checkpoint: the load/text checks pass, the script emits
the one-line verdict, and the VAE/lossless checks correctly FAIL on random
weights (that's the gate doing its job — random weights are not a real
checkpoint)."""

import os
import subprocess
import sys

import pytest

from tests.test_checkpoint_loading import ckpt_dir  # noqa: F401 (fixture)


@pytest.mark.slow
def test_gate_runs_and_gates_on_tiny_ckpt(ckpt_dir):  # noqa: F811
    root, _, _ = ckpt_dir
    env = dict(os.environ, GSWM_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, "tools/real_checkpoint_gate.py", str(root),
         "--preset", "tiny", "--res", "32", "--steps", "2", "--batch", "2"],
        env=env, capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "[ok] load:" in out.stdout, out.stdout + out.stderr[-2000:]
    assert "GATE: " in out.stdout
    # random tiny weights are NOT a usable checkpoint: the sign-fidelity /
    # lossless checks must fail, and the exit code must be non-zero
    assert "GATE: FAIL" in out.stdout
    assert out.returncode == 1
