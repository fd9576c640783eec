"""HBM-aware batch sizing for the extraction pipeline.

The reference has no batch policy at all (it inverts one image at a time and
rebuilds the pipeline per image, extract.py:56-60); gswm batches the whole
inversion scan, which makes batch size the single memory knob.  Round-1
found the failure modes the hard way: 512x512 batch 256 and 768x768 batch 48
both RESOURCE_EXHAUSTED on a 16GB v5e chip.  ``suggest_batch`` keeps sweeps
and benches inside measured-safe territory instead of crashing mid-run.

The model: anchored on measured v5e-16GB points per architecture family.
The measured points show per-image cost growing ~res^4.4 for the SD UNet
scan (192@512 vs 32@768) — far steeper than the naive res^2 token count,
because the attention working set and the VAE chunk budget both scale
superlinearly.  Interpolation therefore fits the exponent to the two
bracketing anchors (log-space) instead of assuming quadratic; outside the
measured range it extrapolates with the fitted family exponent from the
nearest anchor (conservative: the round-2 advisor showed res^2 from the 512
anchor predicts 85@768 where the measured ceiling is 32).
"""

from __future__ import annotations

import math

# Measured on one v5e chip (16GB): largest batch that runs / smallest that
# OOMs, per architecture family.  (res, max_ok_batch).
_MEASURED_V5E_16GB = {
    # sd-2-1-base arch, fp32 weights, 30-step DDIM inversion + chunked VAE
    "sd": {
        512: 192,   # 192 measured OK r2 (4.46 imgs/s; 160 is the throughput
                    # sweet spot at 4.80 r3); 256 RESOURCE_EXHAUSTED r1
        768: 48,    # 48 measured OK r3 (1.52 imgs/s — the r2 resolution-
                    # scaled VAE chunking removed the r1 crash); 64 untested
                    # (projected over-HBM; a failed probe hard-crashes the
                    # tunneled worker, so not probed)
    },
    # sdxl-base arch, bf16 weights (fp32 params alone are 10.3GB — the
    # pipeline auto-selects bf16 residency for this family, see
    # suggest_weights_dtype)
    "sdxl": {
        1024: 8,    # measured OK r4 (0.7035 imgs/s at forced b8, 75.5% of
                    # the naive roofline — vs 0.5944 at the old b2 anchor;
                    # runbook r4b2 bench_sdxl_b8)
    },
}

_WEIGHTS_GB = {"sd": 3.5, "sdxl": 5.2}  # resident UNet+VAE params


def _family_exponent(anchors: dict[int, int]) -> float:
    """Fit batch ~ res^-p to the outermost measured pair (p=4.42 for sd)."""
    if len(anchors) < 2:
        return 4.42  # borrow the sd family's measured exponent
    lo, hi = min(anchors), max(anchors)
    return math.log(anchors[lo] / anchors[hi]) / math.log(hi / lo)


def suggest_batch(res: int, hbm_gb: float = 16.0,
                  requested: int | None = None, arch: str = "sd") -> int:
    """Largest safe batch for an extraction run at ``res`` x ``res``.

    Log-space interpolation between the bracketing measured anchors (or
    fitted-exponent extrapolation from the nearest one), scaled by available
    HBM and floored to a multiple of 8.  ``requested`` clamps rather than
    replaces: callers asking for less get what they asked for.
    """
    anchors = _MEASURED_V5E_16GB.get(arch, _MEASURED_V5E_16GB["sd"])
    p = _family_exponent(anchors)
    below = [r for r in anchors if r <= res]
    above = [r for r in anchors if r >= res]
    if below and above:
        # bracketed: log-linear interpolation between the two anchors (exact
        # at both measured points; for a single shared anchor this is exact)
        r0, r1 = max(below), min(above)
        if r0 == r1:
            batch = float(anchors[r0])
        else:
            t = (math.log(res) - math.log(r0)) / (math.log(r1) - math.log(r0))
            batch = math.exp(
                (1 - t) * math.log(anchors[r0]) + t * math.log(anchors[r1])
            )
    else:
        # outside the measured range: fitted-exponent extrapolation from the
        # nearest anchor (steeper than res^2, so it under- rather than
        # over-estimates toward higher resolutions)
        r0 = min(anchors, key=lambda r: abs(r - res))
        batch = anchors[r0] * (r0 / res) ** p
    weights_gb = _WEIGHTS_GB.get(arch, _WEIGHTS_GB["sd"])
    budget = (hbm_gb - weights_gb) / (16.0 - weights_gb)
    batch = int(batch * budget)
    batch = max(8, (batch // 8) * 8) if batch >= 8 else max(1, batch)
    if requested is not None:
        batch = min(batch, requested)
    return max(1, batch)


# fp32 param residency above this leaves too little of a 16GB chip for the
# inversion scan's activations (SDXL: 10.3GB fp32 params + 16k-token
# activations cannot coexist; measured r2, docs/BENCH.md).
_FP32_RESIDENCY_LIMIT_BYTES = 6 * 1024**3


def suggest_weights_dtype(param_bytes: int,
                          hbm_gb: float = 16.0):
    """bf16 or None (= keep fp32 master weights) for a given fp32 param
    footprint.  fp32 is the default — measured ~7% FASTER than bf16
    residency at SD2.1 scale (XLA hoists the per-use casts out of the scan,
    docs/BENCH.md) — until the fp32 tree itself crowds out activations.
    """
    import jax.numpy as jnp

    limit = _FP32_RESIDENCY_LIMIT_BYTES * (hbm_gb / 16.0)
    return jnp.bfloat16 if param_bytes > limit else None
