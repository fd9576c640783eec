#!/bin/bash
# Resume of runbook_r4b after the driver process died mid step 2 (fit_vae):
# step 1 (bench_sol) completed and wrote benchmarks/sol_denominators.json,
# so this resume re-runs steps 2-9 only.  See runbook_r4b_chip.sh for the
# rationale of each step.
#
#   bash tools/runbook_r4b_resume.sh
#
# Logs: /tmp/runbook_r4b/<step>.log (same dir as the original run)
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/runbook_r4b

log() { echo "[runbook_r4b-resume $(date +%H:%M:%S)] $*" | tee -a /tmp/runbook_r4b/status.log; }

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

# 2. Re-fit the full sd-2-1 VAE + 96 stage for 768px + 128 stage for SDXL.
run fit_vae 5400 python tools/fit_sd21_vae.py \
  --stages "16:1500:32:1e-3,32:500:16:3e-4,64:250:8:1e-4,96:150:4:1e-4,128:100:2:1e-4"
run vae_check 1200 python tools/fit_sd21_vae.py \
  --init benchmarks/fitted_vae_sd21arch.msgpack --check 64,96,128

# 3. BASELINE config 3 at its ACTUAL resolution: 768^2 robustness artifact.
run sweep768 7200 python tools/run_robustness_sweep.py \
  --preset sd-2-1-base --platform tpu --res 768 --batch 8 \
  --out benchmarks/robustness_sweep_sd21arch_768_tpu.jsonl

# 4. Perf levers at 512: mid-grain dispatch fusion (fixed) and the
#    transposed tier (vmem fix landed after its r4a crash).
run bench512_fusemid 3000 env $SYNC GSWM_BENCH_FUSE_MID=1 python bench.py
run bench512_transposed 2400 env $SYNC GSWM_TRANSPOSED_ATTN=1 python bench.py
run attn_ctx_transposed 3600 python tools/exp_attn_context.py lvl0 lvl0_768

# 5. 768 profile + fusemid at 768.
run profile768 2400 env GSWM_PROF_RES=768 python tools/profile_ops.py 48 30
run bench768_fusemid 3000 env $SYNC GSWM_BENCH_FUSE_MID=1 GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=48 python bench.py

# 6. Input-hardened 512 sweep: textured inputs make saturating rows bite.
run sweep512_textured 5400 python tools/run_robustness_sweep.py \
  --preset sd-2-1-base --platform tpu --res 512 --batch 8 --texture 0.15 \
  --attacks none,compression,noise,elastic,blurring,brightness \
  --out benchmarks/robustness_sweep_sd21arch_textured_tpu.jsonl

# 7. SDXL perf story: batch sweep at 1024^2 under bf16 weights.
run bench_sdxl_b4 3600 env $SYNC GSWM_BENCH_PRESET=sdxl-base GSWM_BENCH_RES=1024 \
  GSWM_BENCH_BATCH=4 GSWM_BENCH_WEIGHTS_DTYPE=bf16 python bench.py
run bench_sdxl_b8 3600 env $SYNC GSWM_BENCH_PRESET=sdxl-base GSWM_BENCH_RES=1024 \
  GSWM_BENCH_BATCH=8 GSWM_BENCH_FORCE_BATCH=1 GSWM_BENCH_WEIGHTS_DTYPE=bf16 python bench.py
run attn_ctx_sdxl 2400 python tools/exp_attn_context.py sdxl_lvl1

# 8. SDXL 1024^2 quality artifact.
run sweep_sdxl_quality 7200 python tools/run_robustness_sweep.py \
  --preset sdxl-base --platform tpu --res 1024 --batch 4 --weights-dtype bf16 \
  --attacks none,compression,noise \
  --out benchmarks/robustness_sweep_sdxlarch_1024_tpu.jsonl

# 9. Batch-ceiling probe at 512.
run bench512_b192 2400 env $SYNC GSWM_BENCH_BATCH=192 GSWM_BENCH_FORCE_BATCH=1 python bench.py

log "runbook_r4b resume complete"
