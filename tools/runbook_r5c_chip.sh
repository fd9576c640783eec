#!/bin/bash
# Round-5c follow-up chip runbook: run AFTER runbook_r5_chip.sh completes.
#
#   bash tools/runbook_r5c_chip.sh
#
# Steps (serialized, one TPU job at a time):
#   1. xf_wholeb_512   — bf16-exp xla-flash variant at the 512² lvl0 shape:
#                        quantifies the serial-VPU-exp residual (the only
#                        lever left between 92.1 and the 117.9 cast-chain
#                        control).  Env-gated experiment, NOT a default.
#   2. xf_wholeb_768   — same at 768²'s 9216-token shape.
#   3. bench_768_b64   — can the xf tier's freed footprint raise the 768
#                        batch anchor?  (r4: b48≈b56 under cres; b64 never
#                        fit.)  Forced, OOM is an answer.
#   4. bench_dpms_512  — DPM++-inverse throughput row at repo defaults
#                        (README claims "~same" as DDIM; measure it).
#
# Logs: /tmp/runbook_r5c/<step>.log
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/runbook_r5c

log() { echo "[runbook_r5c $(date +%H:%M:%S)] $*" | tee -a /tmp/runbook_r5c/status.log; }

run() {
  local name=$1 to=$2; shift 2
  log "START $name"
  if timeout "$to" "$@" > "/tmp/runbook_r5c/$name.log" 2>&1; then
    log "OK    $name"
    return 0
  fi
  log "FAIL  $name (see /tmp/runbook_r5c/$name.log)"
  return 1
}

# 0. Retry the 96/128 VAE refinement stages that OOM'd in runbook_r5
#    (582MB HLO-temp at 96x96 batch 4; halve the batches), starting from
#    the committed 64-stage identity fit, then the fidelity report.
run fit_vae_96 7200 python tools/fit_sd21_vae.py \
  --init benchmarks/fitted_vae_sd21arch.msgpack \
  --stages 96:120:2:6e-5,128:80:1:4e-5 \
&& run vae_check 1800 python tools/fit_sd21_vae.py \
  --init benchmarks/fitted_vae_sd21arch.msgpack --check 64,96,128

run xf_wholeb_512 2400 env GSWM_XF_VARIANTS=whole,wholeb \
  python tools/exp_xla_flash.py

run xf_wholeb_768 2400 env GSWM_XF_VARIANTS=whole,wholeb \
  GSWM_XF_SHAPE=48,9216,5,64,384 \
  python tools/exp_xla_flash.py

run bench_768_b64 3600 env GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=64 \
  GSWM_BENCH_FORCE_BATCH=1 GSWM_BENCH_SYNC_EVERY_PASS=1 \
  python bench.py

run bench_dpms_512 3600 env GSWM_BENCH_SCHED=DPMs \
  GSWM_BENCH_SYNC_EVERY_PASS=1 \
  python bench.py

log "runbook_r5c complete"
