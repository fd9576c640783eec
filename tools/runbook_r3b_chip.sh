#!/bin/bash
# Round-3b chip runbook: measure the GroupNorm NCHW-stats formulation and
# the transposed-operand attention tier, strictly sequentially (one TPU job
# at a time — two processes on the tunneled chip corrupt timings/OOM).
#
#   bash tools/runbook_r3b_chip.sh [wait-pid]   # optionally waits for a
#                                               # running TPU job first
#
# Steps (each logged to /tmp/runbook_b/<step>.log):
#   1. exp_attn_context lvl0 lvl0_768 — in-context A/B incl. transposed
#   2. bench 512² b160 with GSWM_TRANSPOSED_ATTN=1
#   3. bench 768² b48 (GroupNorm change alone)
#   4. bench 768² b48 with GSWM_TRANSPOSED_ATTN=1
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/runbook_b

log() { echo "[runbook_b $(date +%H:%M:%S)] $*" | tee -a /tmp/runbook_b/status.log; }

if [ "${1:-}" != "" ]; then
  log "waiting for pid $1 to release the chip..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

log "waiting for tunnel..."
until timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); assert float((x @ x).sum()) == 512.0
print(jax.devices())
" > /tmp/runbook_b/probe.log 2>&1; do
  sleep 120
done
log "tunnel UP"

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  log "START $name"
  if timeout "$to" "$@" > "/tmp/runbook_b/$name.log" 2>&1; then
    log "OK    $name"
    return 0
  fi
  log "FAIL  $name (see /tmp/runbook_b/$name.log)"
  return 1
}

run attn_ctx_transposed 7200 python tools/exp_attn_context.py lvl0 lvl0_768
run bench_512_transposed 5400 env GSWM_TRANSPOSED_ATTN=1 python bench.py
run bench_768_gn 5400 env GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=48 python bench.py
run bench_768_transposed 5400 env GSWM_TRANSPOSED_ATTN=1 GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=48 python bench.py
log "runbook_b complete"
