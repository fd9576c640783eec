#!/bin/bash
# Round-5 chip runbook: everything after the XLA-flash tier landed
# (commit 96c8b9b).  One TPU job at a time through the tunnel.
#
#   bash tools/runbook_r5_chip.sh
#
# Steps (serialized):
#   1. bench_768          — 768² headline with the xf tier (target >=1.66)
#   2. fit_vae            — refit the full-size VAE (msgpack is gitignored,
#                           lost between rounds) + 96/128 refinement stages
#   3. vae_check          — sign-fidelity report at 64/96/128
#   4. sweep_dpms         — DPM++-inverse chip artifact (VERDICT #3):
#                           lossless + compression + blurring at 512²
#   5. quality_512        — performance-lossless population artifact
#                           (VERDICT #6) at 512² batch 64
#   6. sweep_sdxl_hard    — SDXL 1024² discriminative attacks (VERDICT #4)
#   7. bench_sdxl_b8      — fresh-session confirm of the b8 HBM anchor
#   8. fit_vae_spectral   — de-linearization refit (VERDICT #5), --init from
#                           the identity fit, spectral term on
#   9. sweep_spectral     — 512² compression sweep through the spectral VAE
#
# Logs: /tmp/runbook_r5/<step>.log
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/runbook_r5

log() { echo "[runbook_r5 $(date +%H:%M:%S)] $*" | tee -a /tmp/runbook_r5/status.log; }

log "waiting for tunnel..."
until timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); assert float((x @ x).sum()) == 512.0
print(jax.devices())
" > /tmp/runbook_r5/probe.log 2>&1; do
  sleep 120
done
log "tunnel UP"

run() {
  local name=$1 to=$2; shift 2
  log "START $name"
  if timeout "$to" "$@" > "/tmp/runbook_r5/$name.log" 2>&1; then
    log "OK    $name"
    return 0
  fi
  log "FAIL  $name (see /tmp/runbook_r5/$name.log)"
  return 1
}

SYNC="GSWM_BENCH_SYNC=1"

# 1. 768² headline with the xf tier (9216-token bucket measured +27.7%).
run bench_768 3600 env GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=48 \
  python bench.py

# 2+3. VAE refit (identity objective, same recipe as r4b) + refinements at
#      96 (768px) and 128 (1024px), then the fidelity report.
run fit_vae 7200 python tools/fit_sd21_vae.py \
  --stages 16:1500:32:1e-3,32:500:16:3e-4,64:250:8:1e-4,96:120:4:6e-5,128:80:2:4e-5 \
&& run vae_check 1800 python tools/fit_sd21_vae.py \
  --init benchmarks/fitted_vae_sd21arch.msgpack --check 64,96,128

# 4. DPM++ inversion chip artifact (the reference's --scheduler DPMs path).
run sweep_dpms 7200 python tools/run_robustness_sweep.py \
  --preset sd-2-1-base --platform tpu --scheduler DPMs \
  --attacks none,compression,blurring --no-fifty-step-row \
  --out benchmarks/robustness_sweep_sd21arch_dpms_tpu.jsonl

# 5. Performance-lossless population artifact at 512².
run quality_512 7200 python tools/run_quality_artifact.py --batch 64

# 6. SDXL 1024² discriminative attacks (the ones that degrade at 512/768).
run sweep_sdxl_hard 14400 python tools/run_robustness_sweep.py \
  --preset sdxl-base --platform tpu --res 1024 --batch 2 --weights-dtype bf16 \
  --attacks blurring,erasing,randomcrop,resizedcrop,rotation \
  --no-fifty-step-row \
  --out benchmarks/robustness_sweep_sdxlarch_1024_attacks_tpu.jsonl

# 7. Fresh-session confirm of the SDXL b8 anchor (r4d's b4-OOM anomaly).
run bench_sdxl_b8 3600 env GSWM_BENCH_PRESET=sdxl-base GSWM_BENCH_RES=1024 \
  GSWM_BENCH_BATCH=8 GSWM_BENCH_WEIGHTS_DTYPE=bf16 GSWM_BENCH_FORCE_BATCH=1 \
  python bench.py

# 8+9. De-linearization: spectral-regularized refit from the identity fit,
#      then the compression sweep through it (A/B vs sweep_dpms' DDIM rows
#      and the committed r3 DDIM artifact).
run fit_vae_spectral 7200 python tools/fit_sd21_vae.py \
  --init benchmarks/fitted_vae_sd21arch.msgpack \
  --out benchmarks/fitted_vae_sd21arch_spectral.msgpack \
  --spectral 0.1 --stages 16:600:32:3e-4,32:250:16:1e-4,64:150:8:6e-5 \
&& run sweep_spectral 7200 python tools/run_robustness_sweep.py \
  --preset sd-2-1-base --platform tpu \
  --fitted-vae benchmarks/fitted_vae_sd21arch_spectral.msgpack \
  --attacks none,compression --no-fifty-step-row \
  --out benchmarks/robustness_sweep_sd21arch_spectral_tpu.jsonl

log "runbook_r5 complete"
