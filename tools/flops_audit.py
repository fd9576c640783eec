"""Resolve the 768² FLOP-accounting discrepancy (VERDICT r4 next #2).

Round-4 flagged (docs/BENCH.md): at 768² the op profiler's conv bucket
(14.73 s x 152.5 TF/s = 1560 GFLOP/img/step) EXCEEDS the recorded
"XLA cost-analysis 1600.1 GFLOPs/image/step" total, which is impossible
if both are right.  Hypothesis tested here: **XLA cost analysis counts a
Pallas custom call as zero FLOPs**, so any cost-analysis total taken with
the flash kernels routed (every seq >= 1024) omits the self-attention
dots — at 768² that is 5 lvl0 sites x 4*9216^2*320 = 543.6 GFLOP/img/step
of invisible work, which is the gap.

Method (CPU lowering only — FLOP counts are backend-independent and this
must not occupy the chip): lower one UNet apply at batch 1 twice,

  einsum   GSWM_FLASH_MIN_SEQ=10^9 — every attention site is a plain
           einsum, every dot visible to cost analysis: the TRUTH total;
  default  repo routing — flash kernels at seq >= 1024.  On CPU pallas
           runs in interpret mode (the kernel body traces as jax ops), so
           this row shows CPU-interpret accounting; ON TPU the same
           module lowers to opaque custom calls and loses exactly the
           analytic kernel-dot FLOPs below.

plus the ANALYTIC kernel-dot sum over the preset's attention sites
(4*S^2*inner per transformer block at every kernel-routed level).

Then recompute the honest rooflines from the truth totals and the
measured denominators (benchmarks/sol_denominators.json: full-MXU rate
for everything except the kernel dots, which run at the d=64 mix rate):

  naive             truth_total / full_rate
  attention-aware   (truth_total - kernel_dots)/full + kernel_dots/attn

Writes benchmarks/flops_audit.json.

Usage:  python tools/flops_audit.py [--res 512,768]  (runs on CPU)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def analytic_attention_sites(preset_name: str, res: int):
    """(level, tokens, inner, n_blocks, kernel_routed) per attention level.

    Mirrors gswm.models.unet structure: down levels carry layers_per_block
    transformer sites, up levels layers_per_block+1, the mid block one at
    the deepest level; tokens = (latent_hw / 2^level)^2; a site routes to
    the flash kernels iff tokens >= flash_min_seq (layers.py routing).
    """
    from gswm.models.configs import PRESETS

    cfg = PRESETS[preset_name].unet
    vae_scale = 2 ** (len(PRESETS[preset_name].vae.block_out_channels) - 1)
    lat = res // vae_scale
    n_levels = len(cfg.block_out_channels)
    min_seq = int(os.environ.get("GSWM_FLASH_MIN_SEQ", "1024"))
    sites = []
    for lvl in range(n_levels):
        if not cfg.cross_attn_levels[lvl]:
            continue
        tokens = (lat // 2 ** lvl) ** 2
        ch = cfg.block_out_channels[lvl]
        inner = cfg.heads_for(ch) * (cfg.head_dim or ch // cfg.heads_for(ch))
        n_blocks = (2 * cfg.layers_per_block + 1) * cfg.depth_for(lvl)
        sites.append((lvl, tokens, inner, n_blocks, tokens >= min_seq))
    # mid block: one transformer at the deepest level
    mid_ch = cfg.block_out_channels[-1]
    mid_tokens = (lat // 2 ** (n_levels - 1)) ** 2
    mid_inner = (cfg.heads_for(mid_ch)
                 * (cfg.head_dim or mid_ch // cfg.heads_for(mid_ch)))
    mid_depth = cfg.depth_for(n_levels - 1)
    sites.append((n_levels - 1, mid_tokens, mid_inner, mid_depth,
                  mid_tokens >= min_seq))
    return sites


def kernel_dot_gflops(preset_name: str, res: int) -> float:
    """Self-attention dot FLOPs (qkT + PV = 4*S^2*inner) summed over the
    kernel-routed sites — the work a TPU cost analysis cannot see."""
    total = 0.0
    for _lvl, tokens, inner, n_blocks, routed in analytic_attention_sites(
            preset_name, res):
        if routed:
            total += n_blocks * 4.0 * tokens * tokens * inner
    return total / 1e9


def _child(preset: str, res: int) -> None:
    # the axon TPU plugin registers regardless of JAX_PLATFORMS — honor the
    # cpu request explicitly or this child lands on (and blocks) the chip
    from gswm.utils.platform import apply_platform_env, cpu_cache_dir

    apply_platform_env()
    import jax

    jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
    import jax.numpy as jnp

    from gswm.models.configs import PRESETS
    from gswm.models.unet import UNet2DCondition

    preset_cfg = PRESETS[preset]
    vae_scale = 2 ** (len(preset_cfg.vae.block_out_channels) - 1)
    lat = res // vae_scale
    unet = UNet2DCondition(preset_cfg.unet, dtype=jnp.bfloat16)
    params = unet.init_params(jax.random.key(0), latent_hw=(lat, lat),
                              context_len=preset_cfg.text.max_length)
    x = jnp.zeros((1, preset_cfg.unet.sample_channels, lat, lat),
                  jnp.float32)
    t = jnp.asarray([500], jnp.int32)
    ctx = jnp.zeros((1, preset_cfg.text.max_length,
                     preset_cfg.unet.cross_attn_dim), jnp.float32)
    added = None
    if preset_cfg.unet.addition_embed_dim:
        # SDXL micro-conditioning (shapes only — FLOP counting needs no
        # real pooled text): text_embeds = addition_embed_dim - 6*256 dims.
        pooled = preset_cfg.unet.addition_embed_dim - 6 * 256
        added = {"text_embeds": jnp.zeros((1, pooled), jnp.float32),
                 "time_ids": jnp.zeros((1, 6), jnp.float32)}
    lowered = jax.jit(unet.apply).lower(params, x, t, ctx, added)
    cost = lowered.cost_analysis()
    if cost is None:  # this jax version only reports post-compile
        cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0]
    print(f"RESULT {cost.get('flops', 0.0):.6e}", flush=True)


def measure(preset: str, res: int, routing: str) -> float:
    """Lower in a fresh CPU subprocess (routing env is trace-time)."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "GSWM_PLATFORM": "cpu"}
    if routing == "einsum":
        env["GSWM_FLASH_MIN_SEQ"] = "1000000000"
    proc = subprocess.run(
        [sys.executable, __file__, "--child", preset, str(res)],
        env=env, capture_output=True, text=True, timeout=1800)
    for ln in proc.stdout.splitlines():
        if ln.startswith("RESULT"):
            return float(ln.split()[1]) / 1e9
    raise RuntimeError(
        f"child failed (preset={preset} res={res} routing={routing}):\n"
        + proc.stderr[-2000:])


def main() -> None:
    if sys.argv[1:2] == ["--child"]:
        _child(sys.argv[2], int(sys.argv[3]))
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="sd-2-1-base")
    ap.add_argument("--res", default="512,768")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", default="benchmarks/flops_audit.json")
    args = ap.parse_args()

    sol_path = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                            "sol_denominators.json")
    rates = {"full_matmul_tf": 174.0, "attn_mix_d64_tf": 116.5}
    if os.path.exists(sol_path):
        with open(sol_path) as f:
            rates.update(json.load(f))
    full_tf = rates["full_matmul_tf"]
    attn_tf = rates["attn_mix_d64_tf"]

    rows = []
    for res in (int(r) for r in args.res.split(",")):
        einsum = measure(args.preset, res, "einsum")
        default = measure(args.preset, res, "default")
        kdots = kernel_dot_gflops(args.preset, res)
        conv_other = einsum - kdots
        naive = 1.0 / (einsum * args.steps / (full_tf * 1e3))
        aware = 1.0 / ((conv_other / full_tf + kdots / attn_tf)
                       * args.steps / 1e3)
        row = {
            "preset": args.preset, "res": res, "steps": args.steps,
            "gflops_per_img_step_einsum_truth": round(einsum, 1),
            "gflops_per_img_step_default_routing_cpu": round(default, 1),
            "analytic_kernel_dot_gflops": round(kdots, 1),
            "tpu_cost_analysis_would_report": round(einsum - kdots, 1),
            "naive_roofline_imgs_per_sec": round(naive, 3),
            "attention_aware_sol_imgs_per_sec": round(aware, 3),
            "rates_used": {"full_tf": full_tf, "attn_tf": attn_tf},
        }
        rows.append(row)
        print(json.dumps(row, indent=1), flush=True)

    with open(args.out, "w") as f:
        json.dump({"tool": "tools/flops_audit.py",
                   "note": "einsum row lowers every attention dot visibly; "
                           "a TPU cost analysis with flash routing omits "
                           "the Pallas custom-call dots (analytic row)",
                   "rows": rows}, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
