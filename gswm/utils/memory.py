"""HBM-aware batch sizing for the extraction pipeline.

The reference has no batch policy at all (it inverts one image at a time and
rebuilds the pipeline per image, extract.py:56-60); gswm batches the whole
inversion scan, which makes batch size the single memory knob.  Round-1
found the failure modes the hard way: 512x512 batch 256 and 768x768 batch 48
both RESOURCE_EXHAUSTED on a 16GB v5e chip.  ``suggest_batch`` keeps sweeps
and benches inside measured-safe territory instead of crashing mid-run.

The model: per-image activation footprint of the UNet inversion scan scales
with the latent token count (quadratic in resolution); weights are constant.
Anchored on measured v5e-16GB points and deliberately conservative between
them (rounds down to a multiple of 8 for tile alignment).
"""

from __future__ import annotations

# Measured on one v5e chip (16GB), sd-2-1-base arch, 30-step DDIM inversion
# scan + chunked VAE: largest batch that runs / smallest that OOMs.
# (res, max_ok_batch) — refined whenever a new measurement lands.
_MEASURED_V5E_16GB = {
    512: 192,   # 192 measured OK r2 (4.46 imgs/s; 160 is the throughput
                # sweet spot at 4.49); 256 RESOURCE_EXHAUSTED r1
    768: 32,    # 32 measured OK r2 (1.37 imgs/s); 48 crashed r1 pre-chunking
}

_WEIGHTS_GB = 3.5  # fp32 sd-2-1-base UNet+VAE resident params


def suggest_batch(res: int, hbm_gb: float = 16.0,
                  requested: int | None = None) -> int:
    """Largest safe batch for an extraction run at ``res`` x ``res``.

    Interpolates per-image cost from the nearest measured anchor by token
    ratio (res^2), scales by available HBM, and floors to a multiple of 8.
    ``requested`` clamps rather than replaces: callers asking for less get
    what they asked for.
    """
    anchor_res = min(_MEASURED_V5E_16GB, key=lambda r: abs(r - res))
    anchor_batch = _MEASURED_V5E_16GB[anchor_res]
    # per-image cost ~ res^2; the 768 anchor embeds the superlinear attention
    # overhead, so interpolation from the nearest anchor stays honest.
    scale = (anchor_res / res) ** 2
    budget = (hbm_gb - _WEIGHTS_GB) / (16.0 - _WEIGHTS_GB)
    batch = int(anchor_batch * scale * budget)
    batch = max(8, (batch // 8) * 8)
    if requested is not None:
        batch = min(batch, requested)
    return max(1, batch)
