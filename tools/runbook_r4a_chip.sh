#!/bin/bash
# Round-4a chip runbook: measure the speed-of-light denominators, then
# disposition every round-3 perf experiment e2e at the per-pass-sync
# protocol (the VERDICT r3 grading protocol), strictly sequentially.
#
#   bash tools/runbook_r4a_chip.sh
#
# Steps (logged to /tmp/runbook_r4a/<step>.log):
#   1. bench_sol            — measured d=64 structural cap (VERDICT missing #4)
#   2. bench512_default     — baseline row, per-pass-sync
#   3. bench512_gn_nhwc     — GroupNorm NCHW-stats change OFF (explicit A/B)
#   4. attn_ctx             — transposed tier in-context at lvl0 + lvl0_768
#   5. bench512_transposed  — GSWM_TRANSPOSED_ATTN=1 e2e
#   6. bench512_selfproj    — GSWM_SELF_PROJ=separate e2e
#   7. bench512_fusemid     — embed+scan+decode one-jit dispatch fusion
#   8. bench768_default     — 768x48 baseline, per-pass-sync
#   9. bench768_transposed  — transposed tier at 768
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/runbook_r4a

log() { echo "[runbook_r4a $(date +%H:%M:%S)] $*" | tee -a /tmp/runbook_r4a/status.log; }

log "waiting for tunnel..."
until timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); assert float((x @ x).sum()) == 512.0
print(jax.devices())
" > /tmp/runbook_r4a/probe.log 2>&1; do
  sleep 120
done
log "tunnel UP"

run() {
  local name=$1 to=$2; shift 2
  log "START $name"
  if timeout "$to" "$@" > "/tmp/runbook_r4a/$name.log" 2>&1; then
    log "OK    $name"
    return 0
  fi
  log "FAIL  $name (see /tmp/runbook_r4a/$name.log)"
  return 1
}

SYNC="GSWM_BENCH_SYNC_EVERY_PASS=1"

run bench_sol 2400 python tools/bench_sol.py
run bench512_default 2400 env $SYNC python bench.py
run bench512_gn_nhwc 2400 env $SYNC GSWM_GN_STATS=nhwc python bench.py
run attn_ctx 3600 python tools/exp_attn_context.py lvl0 lvl0_768
run bench512_transposed 2400 env $SYNC GSWM_TRANSPOSED_ATTN=1 python bench.py
run bench512_selfproj 2400 env $SYNC GSWM_SELF_PROJ=separate python bench.py
run bench512_fusemid 2400 env $SYNC GSWM_BENCH_FUSE_MID=1 python bench.py
run bench768_default 2400 env $SYNC GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=48 python bench.py
run bench768_transposed 2400 env $SYNC GSWM_TRANSPOSED_ATTN=1 GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=48 python bench.py
log "runbook_r4a complete"
