#!/bin/bash
# Round-3d chip runbook: validate the default-on GroupNorm NCHW-stats change
# e2e (it landed unmeasured when the tunnel dropped), then the transposed-
# operand attention tier, strictly sequentially.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/runbook_d
log() { echo "[runbook_d $(date +%H:%M:%S)] $*" | tee -a /tmp/runbook_d/status.log; }
run() {
  local name=$1 to=$2; shift 2
  log "START $name"
  if timeout "$to" "$@" > "/tmp/runbook_d/$name.log" 2>&1; then
    log "OK    $name"
  else
    log "FAIL  $name"
  fi
}
run bench_512_default 2400 python bench.py
run bench_768_default 2400 env GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=48 python bench.py
run attn_ctx_transposed 2400 python tools/exp_attn_context.py lvl0 lvl0_768
run bench_512_transposed 2400 env GSWM_TRANSPOSED_ATTN=1 python bench.py
run bench_768_transposed 2400 env GSWM_TRANSPOSED_ATTN=1 GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=48 python bench.py
log "runbook_d complete"
