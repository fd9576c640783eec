#!/bin/bash
# Round-4b chip runbook: honest SOL measurement, the round-3 artifact debts
# (768^2 robustness, SDXL perf+quality), and the remaining perf levers,
# strictly sequentially.  Runs after runbook_r4a's findings:
#   - bench_sol's r4a numbers came from the BROKEN delta-timing (494 TF/s >
#     chip peak); step 1 below re-measures with the fixed protocol.
#   - fusemid timed out compiling 3.5GB of captured constants; bench.py now
#     passes params as jit arguments.
#   - transposed tier failed scoped-vmem at 512 BEFORE the 9b1b9a6 fix and
#     measured a loss at 768 after it; step re-measures 512 for disposition.
#
#   bash tools/runbook_r4b_chip.sh
#
# Logs: /tmp/runbook_r4b/<step>.log
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/runbook_r4b

log() { echo "[runbook_r4b $(date +%H:%M:%S)] $*" | tee -a /tmp/runbook_r4b/status.log; }

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

# 1. Honest SOL denominators (VERDICT r3 missing #4) — writes
#    benchmarks/sol_denominators.json which bench.py reads.
run bench_sol 3000 python tools/bench_sol.py

# 2. Re-fit the full sd-2-1 VAE (the round-3 msgpack is gitignored and this
#    machine is fresh) + a 96x96-latent stage for 768px (VERDICT #3) and a
#    128 stage for SDXL 1024px (VERDICT #7).
run fit_vae 3600 python tools/fit_sd21_vae.py \
  --stages "16:1500:32:1e-3,32:500:16:3e-4,64:250:8:1e-4,96:150:4:1e-4,128:100:2:1e-4"
run vae_check 1200 python tools/fit_sd21_vae.py \
  --init benchmarks/fitted_vae_sd21arch.msgpack --check 64,96,128

# 3. BASELINE config 3 at its ACTUAL resolution: the 768^2 robustness
#    artifact (VERDICT r3 missing #1), with the 50-step lossless row
#    (README.md:265-266).
run sweep768 7200 python tools/run_robustness_sweep.py \
  --preset sd-2-1-base --platform tpu --res 768 --batch 8 \
  --out benchmarks/robustness_sweep_sd21arch_768_tpu.jsonl

# 4. Perf levers at 512 (VERDICT #1): mid-grain dispatch fusion (fixed) and
#    the transposed tier (vmem fix landed after its r4a crash).
run bench512_fusemid 3000 env $SYNC GSWM_BENCH_FUSE_MID=1 python bench.py
run bench512_transposed 2400 env $SYNC GSWM_TRANSPOSED_ATTN=1 python bench.py
run attn_ctx_transposed 3600 python tools/exp_attn_context.py lvl0 lvl0_768

# 5. 768 profile + fusemid at 768 (VERDICT #5).
run profile768 2400 env GSWM_PROF_RES=768 python tools/profile_ops.py 48 30
run bench768_fusemid 3000 env $SYNC GSWM_BENCH_FUSE_MID=1 GSWM_BENCH_RES=768 GSWM_BENCH_BATCH=48 python bench.py

# 6. Input-hardened 512 sweep (VERDICT weak #3 / next #6): textured inputs
#    make the saturating value-attack rows bite.
run sweep512_textured 5400 python tools/run_robustness_sweep.py \
  --preset sd-2-1-base --platform tpu --res 512 --batch 8 --texture 0.15 \
  --attacks none,compression,noise,elastic,blurring,brightness \
  --out benchmarks/robustness_sweep_sd21arch_textured_tpu.jsonl

# 7. SDXL perf story (VERDICT #4): batch sweep at 1024^2 under bf16 weights.
run bench_sdxl_b4 3600 env $SYNC GSWM_BENCH_PRESET=sdxl-base GSWM_BENCH_RES=1024 \
  GSWM_BENCH_BATCH=4 GSWM_BENCH_WEIGHTS_DTYPE=bf16 python bench.py
run bench_sdxl_b8 3600 env $SYNC GSWM_BENCH_PRESET=sdxl-base GSWM_BENCH_RES=1024 \
  GSWM_BENCH_BATCH=8 GSWM_BENCH_FORCE_BATCH=1 GSWM_BENCH_WEIGHTS_DTYPE=bf16 python bench.py
run attn_ctx_sdxl 2400 python tools/exp_attn_context.py sdxl_lvl1

# 8. SDXL 1024^2 quality artifact (VERDICT #7): embed->generate->attack->
#    invert->decode roundtrip with a lossless row, fitted VAE (arch-shared
#    with sd-2-1), bf16 weights.
run sweep_sdxl_quality 7200 python tools/run_robustness_sweep.py \
  --preset sdxl-base --platform tpu --res 1024 --batch 4 --weights-dtype bf16 \
  --attacks none,compression,noise \
  --out benchmarks/robustness_sweep_sdxlarch_1024_tpu.jsonl

# 9. Batch-ceiling probe at 512 (amortizes fixed per-pass cost; HBM policy
#    anchor update if it survives).
run bench512_b192 2400 env $SYNC GSWM_BENCH_BATCH=192 GSWM_BENCH_FORCE_BATCH=1 python bench.py

log "runbook_r4b complete"
