#!/bin/bash
# Second resume of runbook_r4b + the r4c cres experiments, merged and
# REORDERED: perf A/Bs first (their outcomes decide default flips that the
# driver's end-of-round bench must see), artifacts second.
#
# Context: the first resume died at the 96x96 VAE-fit stage (pallas flash
# attention has no autodiff rule; fixed by the GSWM_VAE_ATTN=chunked
# fitting mode) and its sweep768 step then ran without a fitted VAE (rows
# at the 0.5 floor — discarded).  fit_sd21_vae.py now checkpoints per
# stage.
#
#   bash tools/runbook_r4b2_chip.sh
#
# Logs: /tmp/runbook_r4b/<step>.log (same dir as the original run)
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/runbook_r4b

log() { echo "[runbook_r4b2 $(date +%H:%M:%S)] $*" | tee -a /tmp/runbook_r4b/status.log; }

log "waiting for tunnel..."
until timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); assert float((x @ x).sum()) == 512.0
print(jax.devices())
" > /tmp/runbook_r4b/probe.log 2>&1; do
  sleep 120
done
log "tunnel UP"

run() {
  local name=$1 to=$2; shift 2
  log "START $name"
  if timeout "$to" "$@" > "/tmp/runbook_r4b/$name.log" 2>&1; then
    log "OK    $name"
    return 0
  fi
  log "FAIL  $name (see /tmp/runbook_r4b/$name.log)"
  return 1
}

SYNC="GSWM_BENCH_SYNC_EVERY_PASS=1"

# -- A. fast-fail probe of the fitting fix at the LARGEST retained stage.
#       The 96x96 stage is GONE: its backward OOMs the compiler at 83G vs
#       15.75G HBM (single-checkpoint remat materializes the whole 768px
#       decoder backward; /tmp/runbook_r4b/fit_probe.log 11:11) and the OOM
#       crashes the tunnel compile helper for ~15 min.  Conv/attention VAE
#       weights are resolution-agnostic, so the 64-stage fit is CHECKED at
#       96/128 instead (vae_check below gates the 768/1024 sweeps).
run fit_probe 1800 python tools/fit_sd21_vae.py \
  --stages "64:3:8:1e-4" --out /tmp/fit_probe.msgpack

# -- B. perf levers at 512 (VERDICT #1): every e2e row at the per-pass-sync
#       grading protocol.  Outcomes decide default flips.
run bench512_cres 2400 env $SYNC GSWM_CRES_ATTN=1 python bench.py
run bench512_fusemid 3000 env $SYNC GSWM_BENCH_FUSE_MID=1 python bench.py
run bench512_cres_fusemid 2400 env $SYNC GSWM_CRES_ATTN=1 GSWM_BENCH_FUSE_MID=1 python bench.py
run bench512_transposed 2400 env $SYNC GSWM_TRANSPOSED_ATTN=1 python bench.py
run attn_ctx_lvl0 3600 python tools/exp_attn_context.py lvl0
run cres_blocks 2400 python tools/exp_cres_blocks.py lvl0

# -- C. 768 perf rows (VERDICT #5).
run bench768_fusemid 3000 env $SYNC GSWM_BENCH_FUSE_MID=1 GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=48 python bench.py
run bench768_b56 2400 env $SYNC GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=56 GSWM_BENCH_FORCE_BATCH=1 python bench.py

# -- D. the progressive VAE fit (round-3 recipe; 96/128 fit stages dropped,
#       see A), checkpointed per stage, then the 96/128 fidelity CHECK that
#       gates the 768/1024 sweeps.
run fit_vae 5400 python tools/fit_sd21_vae.py \
  --stages "16:1500:32:1e-3,32:500:16:3e-4,64:300:8:1e-4"
run vae_check 1800 python tools/fit_sd21_vae.py \
  --init benchmarks/fitted_vae_sd21arch.msgpack --check 64,96,128

# -- E. BASELINE config 3 at its ACTUAL resolution: 768^2 robustness
#       artifact with the 50-step row (VERDICT #3, #6).
run sweep768 7200 python tools/run_robustness_sweep.py \
  --preset sd-2-1-base --platform tpu --res 768 --batch 8 \
  --out benchmarks/robustness_sweep_sd21arch_768_tpu.jsonl

# -- F. input-hardened 512 sweep (VERDICT #6).
run sweep512_textured 5400 python tools/run_robustness_sweep.py \
  --preset sd-2-1-base --platform tpu --res 512 --batch 8 --texture 0.15 \
  --attacks none,compression,noise,elastic,blurring,brightness \
  --out benchmarks/robustness_sweep_sd21arch_textured_tpu.jsonl

# -- G. SDXL perf story (VERDICT #4): batch sweep at 1024^2, bf16 weights.
run bench_sdxl_b4 3600 env $SYNC GSWM_BENCH_PRESET=sdxl-base GSWM_BENCH_RES=1024 \
  GSWM_BENCH_BATCH=4 GSWM_BENCH_WEIGHTS_DTYPE=bf16 python bench.py
run bench_sdxl_b8 3600 env $SYNC GSWM_BENCH_PRESET=sdxl-base GSWM_BENCH_RES=1024 \
  GSWM_BENCH_BATCH=8 GSWM_BENCH_FORCE_BATCH=1 GSWM_BENCH_WEIGHTS_DTYPE=bf16 python bench.py
run attn_ctx_sdxl 2400 python tools/exp_attn_context.py sdxl_lvl1

# -- H. SDXL 1024^2 quality artifact (VERDICT #7).
run sweep_sdxl_quality 7200 python tools/run_robustness_sweep.py \
  --preset sdxl-base --platform tpu --res 1024 --batch 4 --weights-dtype bf16 \
  --attacks none,compression,noise \
  --out benchmarks/robustness_sweep_sdxlarch_1024_tpu.jsonl

# -- I. batch-ceiling probe at 512.
run bench512_b192 2400 env $SYNC GSWM_BENCH_BATCH=192 GSWM_BENCH_FORCE_BATCH=1 python bench.py

log "runbook_r4b2 complete"
