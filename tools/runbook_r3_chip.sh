#!/bin/bash
# Round-3 chip-return runbook: the measurement sequence for the pending
# BENCH.md table, run STRICTLY sequentially (one TPU job at a time — two
# processes on the tunneled chip corrupt timings / OOM each other).
#
#   bash tools/runbook_r3_chip.sh   # waits for the tunnel, then runs all
#
# Steps (each logged to /tmp/runbook/<step>.log):
#   0. wait for the axon tunnel to answer a tiny matmul
#   1. exp_packed_validate  — pair-packed kernel through real Mosaic
#   2. exp_attn_context lvl0 — in-context split vs packed A/B
#   3. bench 512² b160, per-pass-sync (round-2-comparable protocol)
#   4. bench 512² b160, pipelined protocol (new default)
#   5. bench 512² b160, pipelined + GSWM_PACKED_ATTN=1 (only if step 1 OK)
#   6. bench 768² b48, pipelined
#   7. exp_gn_formulations  — GroupNorm stats reformulation A/B
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/runbook

log() { echo "[runbook $(date +%H:%M:%S)] $*" | tee -a /tmp/runbook/status.log; }

log "waiting for tunnel..."
until timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); assert float((x @ x).sum()) == 512.0
print(jax.devices())
" > /tmp/runbook/probe.log 2>&1; do
  sleep 120
done
log "tunnel UP"

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  log "START $name"
  if timeout "$to" "$@" > "/tmp/runbook/$name.log" 2>&1; then
    log "OK    $name"
    return 0
  fi
  log "FAIL  $name (see /tmp/runbook/$name.log)"
  return 1
}

PACKED_OK=0
run packed_validate 3600 python tools/exp_packed_validate.py && PACKED_OK=1

if [ "$PACKED_OK" = 1 ]; then
  run attn_context_lvl0 7200 python tools/exp_attn_context.py lvl0 lvl0_768 lvl1_768
fi

run bench_sync 5400 env GSWM_BENCH_SYNC_EVERY_PASS=1 python bench.py
run bench_pipelined 5400 python bench.py

if [ "$PACKED_OK" = 1 ]; then
  run bench_packed 5400 env GSWM_PACKED_ATTN=1 python bench.py
fi

run bench_768 5400 env GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=48 python bench.py

if [ "$PACKED_OK" = 1 ]; then
  run bench_768_packed 5400 env GSWM_PACKED_ATTN=1 GSWM_BENCH_RES=768 \
    GSWM_BENCH_BATCH=48 python bench.py
fi

run gn_formulations 5400 python tools/exp_gn_formulations.py

if [ "$PACKED_OK" = 1 ]; then
  # op-category budget with the packed tier on: the copy-category delta is
  # the evidence for the BENCH.md round-3 table
  run profile_packed 5400 env GSWM_PACKED_ATTN=1 python tools/profile_ops.py 160 30
fi

log "runbook complete"
