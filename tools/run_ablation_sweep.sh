#!/bin/bash
# Sequential ablation sweep at the bench operating point (512x512, batch 160,
# 30-step DDIM).  One TPU job at a time (axon tunnel corrupts timings under
# concurrency).  Cold compiles through the remote helper can take 10+ min --
# allow 40 min per config.
cd /root/repo
for ab in sattn attn norm ff; do
  echo "=== ABLATE='${ab}' ==="
  GSWM_ABLATE="$ab" GSWM_BENCH_BATCH=160 timeout 2400 python bench.py 2>&1 | grep -v WARNING | tail -2
done
