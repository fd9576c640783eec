#!/bin/bash
# Round-5d chip runbook: the artifact backlog after the fitted VAE
# (gitignored msgpack) was lost between tunnel sessions.  Refit first,
# then the four VERDICT artifacts in judge-priority order, then the
# leftover r5c probes.  One TPU job at a time.
#
#   bash tools/runbook_r5d_chip.sh
#
# Steps (serialized):
#   1. fit_vae          — identity refit, base stages + halved 96/128
#                         refinements (r5c retry: the r5 run OOM'd at
#                         96x96 batch 4 on a 582MB HLO temp; batches 2/1).
#                         Checkpoints after every stage, so a 96/128 OOM
#                         still leaves the 64-stage fit on disk.
#   2. vae_check        — sign-fidelity report at 64/96/128
#   3. sweep_dpms       — DPM++-inverse chip artifact (VERDICT #3)
#   4. quality_512      — performance-lossless population artifact
#                         (VERDICT #6) at 512^2 batch 64
#   5. sweep_sdxl_hard  — SDXL 1024^2 discriminative attacks (VERDICT #4)
#   6. bench_sdxl_b8    — fresh-session confirm of the b8 HBM anchor
#   7. fit_vae_spectral + sweep_spectral — de-linearization (VERDICT #5)
#   8. bench_dpms_512   — DPM++-inverse throughput row (r5c leftover)
#
# Logs: /tmp/r5d/<step>.log
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5d

log() { echo "[r5d $(date +%H:%M:%S)] $*" | tee -a /tmp/r5d/status.log; }

log "waiting for tunnel..."
until timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); assert float((x @ x).sum()) == 512.0
print(jax.devices())
" > /tmp/r5d/probe.log 2>&1; do
  sleep 60
done
log "tunnel UP"

run() {
  local name=$1 to=$2; shift 2
  log "START $name"
  if timeout "$to" "$@" > "/tmp/r5d/$name.log" 2>&1; then
    log "OK    $name"
    return 0
  fi
  log "FAIL  $name (see /tmp/r5d/$name.log)"
  return 1
}

run fit_vae 7200 python tools/fit_sd21_vae.py \
  --stages 16:1500:32:1e-3,32:500:16:3e-4,64:250:8:1e-4,96:120:2:6e-5,128:80:1:4e-5

run vae_check 1800 python tools/fit_sd21_vae.py \
  --init benchmarks/fitted_vae_sd21arch.msgpack --check 64,96,128

run sweep_dpms 7200 python tools/run_robustness_sweep.py \
  --preset sd-2-1-base --platform tpu --scheduler DPMs \
  --attacks none,compression,blurring --no-fifty-step-row \
  --out benchmarks/robustness_sweep_sd21arch_dpms_tpu.jsonl

run quality_512 7200 python tools/run_quality_artifact.py --batch 64

run sweep_sdxl_hard 14400 python tools/run_robustness_sweep.py \
  --preset sdxl-base --platform tpu --res 1024 --batch 2 --weights-dtype bf16 \
  --attacks blurring,erasing,randomcrop,resizedcrop,rotation \
  --no-fifty-step-row \
  --out benchmarks/robustness_sweep_sdxlarch_1024_attacks_tpu.jsonl

run bench_sdxl_b8 3600 env GSWM_BENCH_PRESET=sdxl-base GSWM_BENCH_RES=1024 \
  GSWM_BENCH_BATCH=8 GSWM_BENCH_WEIGHTS_DTYPE=bf16 GSWM_BENCH_FORCE_BATCH=1 \
  python bench.py

run fit_vae_spectral 7200 python tools/fit_sd21_vae.py \
  --init benchmarks/fitted_vae_sd21arch.msgpack \
  --out benchmarks/fitted_vae_sd21arch_spectral.msgpack \
  --spectral 0.1 --stages 16:600:32:3e-4,32:250:16:1e-4,64:150:8:6e-5 \
&& run sweep_spectral 7200 python tools/run_robustness_sweep.py \
  --preset sd-2-1-base --platform tpu \
  --fitted-vae benchmarks/fitted_vae_sd21arch_spectral.msgpack \
  --attacks none,compression --no-fifty-step-row \
  --out benchmarks/robustness_sweep_sd21arch_spectral_tpu.jsonl

run bench_dpms_512 3600 env GSWM_BENCH_SCHED=DPMs \
  GSWM_BENCH_SYNC_EVERY_PASS=1 \
  python bench.py

log "r5d complete"
