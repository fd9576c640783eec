#!/bin/bash
# Round-4d: final headline rows after the cres default flip (150e01f) and
# the measured block recalibration (9efe3cb, auto now (512,2048) at lvl0).
#
#   bash tools/runbook_r4d_chip.sh
#
# Logs: /tmp/runbook_r4d/<step>.log
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/runbook_r4d

log() { echo "[runbook_r4d $(date +%H:%M:%S)] $*" | tee -a /tmp/runbook_r4d/status.log; }

log "waiting for tunnel..."
until timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); assert float((x @ x).sum()) == 512.0
print(jax.devices())
" > /tmp/runbook_r4d/probe.log 2>&1; do
  sleep 120
done
log "tunnel UP"

run() {
  local name=$1 to=$2; shift 2
  log "START $name"
  if timeout "$to" "$@" > "/tmp/runbook_r4d/$name.log" 2>&1; then
    log "OK    $name"
    return 0
  fi
  log "FAIL  $name (see /tmp/runbook_r4d/$name.log)"
  return 1
}

SYNC="GSWM_BENCH_SYNC_EVERY_PASS=1"

# 1. The headline: repo defaults (cres on, blocks (512,2048)), grading
#    protocol, then the pipelined serving protocol.
run bench512_final_sync 2400 env $SYNC python bench.py
run bench512_final_pipe 2400 python bench.py

# 1b. sweep768 RERUN (VERDICT #3, BASELINE config 3's actual resolution):
#     the r4b2 attempt OOM'd decoding batch 8 at 768px before the decode
#     chunk budget got its 4x safety factor — the fitted VAE checks 0.9966
#     sign fidelity at 96x96, so the artifact is live now.
run sweep768 7200 python tools/run_robustness_sweep.py \
  --preset sd-2-1-base --platform tpu --res 768 --batch 8 \
  --out benchmarks/robustness_sweep_sd21arch_768_tpu.jsonl

# 2. In-context confirmation of the recalibrated auto pick; lvl1 row asks
#    whether cres also beats the fused-qkv window at 1024 tokens.
run attn_ctx_final 3000 python tools/exp_attn_context.py lvl0 lvl1

# 3. cres at 9216 tokens (768² lvl0): scratch-cap override lets the
#    (256,512) config through (estimate 15.94MB vs the measured 16.2MB
#    ceiling) — first real-Mosaic compile of cres at this shape, in-context
#    A/B then e2e.  A compile failure here costs nothing (opt-in path).
run attn_ctx_cres768 2400 env GSWM_CRES_SCRATCH_CAP=15000000 python tools/exp_attn_context.py lvl0_768
run bench768_cres 2400 env $SYNC GSWM_CRES_SCRATCH_CAP=15000000 GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=48 python bench.py
run bench768_cres_b56 2400 env $SYNC GSWM_CRES_SCRATCH_CAP=15000000 GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=56 GSWM_BENCH_FORCE_BATCH=1 python bench.py

# 4. SDXL forced-b4 row (the unforced r4b2 request was policy-clamped to
#    b2 = 0.5944 imgs/sec; the batch sweep needs the 4-point).
run bench_sdxl_b4_forced 3600 env $SYNC GSWM_BENCH_PRESET=sdxl-base GSWM_BENCH_RES=1024 \
  GSWM_BENCH_BATCH=4 GSWM_BENCH_FORCE_BATCH=1 GSWM_BENCH_WEIGHTS_DTYPE=bf16 python bench.py

# 5. SDXL 1024² quality artifact RETRY: the r4b2 attempt OOM'd compiling
#    the extra 50-step inversion graph on top of the batch-4 graphs —
#    batch 2 + no 50-step row keeps the resident-graph set inside HBM.
run sweep_sdxl_quality 7200 python tools/run_robustness_sweep.py \
  --preset sdxl-base --platform tpu --res 1024 --batch 2 --weights-dtype bf16 \
  --attacks none,compression,noise --no-fifty-step-row \
  --out benchmarks/robustness_sweep_sdxlarch_1024_tpu.jsonl

log "runbook_r4d complete"
