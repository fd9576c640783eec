#!/bin/bash
# Round-4e: SDXL 1024² quality artifact, minimal footprint.  The r4b2 and
# r4d attempts OOM'd late in a long chip day (b4 bench OOM'd where b8 had
# succeeded hours earlier — device-state accumulation on the tunnel side),
# so this retries smallest-first after a fresh tunnel wait: the lossless
# row alone, then adding attacks only if the first step survives.
#
#   bash tools/runbook_r4e_chip.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/runbook_r4e

log() { echo "[runbook_r4e $(date +%H:%M:%S)] $*" | tee -a /tmp/runbook_r4e/status.log; }

log "waiting for tunnel..."
until timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); assert float((x @ x).sum()) == 512.0
print(jax.devices())
" > /tmp/runbook_r4e/probe.log 2>&1; do
  sleep 120
done
log "tunnel UP"

run() {
  local name=$1 to=$2; shift 2
  log "START $name"
  if timeout "$to" "$@" > "/tmp/runbook_r4e/$name.log" 2>&1; then
    log "OK    $name"
    return 0
  fi
  log "FAIL  $name (see /tmp/runbook_r4e/$name.log)"
  return 1
}

# 1. Lossless row only (VERDICT #7's core: embed -> generate -> invert ->
#    decode roundtrip at 1024² with a 1.000 control).
run sweep_sdxl_lossless 3600 python tools/run_robustness_sweep.py \
  --preset sdxl-base --platform tpu --res 1024 --batch 2 --weights-dtype bf16 \
  --attacks none --no-fifty-step-row \
  --out benchmarks/robustness_sweep_sdxlarch_1024_tpu.jsonl \
&& \
run sweep_sdxl_attacks 7200 python tools/run_robustness_sweep.py \
  --preset sdxl-base --platform tpu --res 1024 --batch 2 --weights-dtype bf16 \
  --attacks compression,noise --no-fifty-step-row \
  --out benchmarks/robustness_sweep_sdxlarch_1024_attacks_tpu.jsonl

log "runbook_r4e complete"
