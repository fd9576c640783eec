#!/bin/bash
# Sequential ablation sweep at the bench operating point (512x512, batch 160,
# 30-step DDIM).  One TPU job at a time (axon tunnel corrupts timings under
# concurrency).  Output: one line per config.
cd /root/repo
for ab in "" sattn xattn ff norm attn; do
  echo "=== ABLATE='${ab}' ==="
  GSWM_ABLATE="$ab" GSWM_BENCH_BATCH=160 timeout 900 python bench.py 2>/dev/null
done
