#!/bin/bash
# Round-3c chip runbook: cross-attention kernel hypothesis + 768² stage
# profile, strictly sequential on the tunneled chip.
#
#   bash tools/runbook_r3c_chip.sh [wait-pid]
#
# Steps (logged to /tmp/runbook_c/<step>.log):
#   1. exp_cross_attention 160 — padded-K resident kernel vs einsum for the
#      77-token CLIP cross path (round-2's dedicated-kernel failures used
#      per-q-tile grids; this reuses the resident tier with K padded to 128)
#   2. profile_ops at 768² b48 — the 512² stage split doesn't transfer
#      (VERDICT r2 next #6: VAE chunking costs more at 768)
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/runbook_c

log() { echo "[runbook_c $(date +%H:%M:%S)] $*" | tee -a /tmp/runbook_c/status.log; }

if [ "${1:-}" != "" ]; then
  log "waiting for pid $1 to release the chip..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

log "waiting for tunnel..."
until timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); assert float((x @ x).sum()) == 512.0
print(jax.devices())
" > /tmp/runbook_c/probe.log 2>&1; do
  sleep 120
done
log "tunnel UP"

run() {
  local name=$1 to=$2; shift 2
  log "START $name"
  if timeout "$to" "$@" > "/tmp/runbook_c/$name.log" 2>&1; then
    log "OK    $name"
    return 0
  fi
  log "FAIL  $name (see /tmp/runbook_c/$name.log)"
  return 1
}

run cross_attn 3600 python tools/exp_cross_attention.py 160
run profile_768 5400 env GSWM_PROF_RES=768 python tools/profile_ops.py 48 30
log "runbook_c complete"
