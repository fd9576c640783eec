"""Per-stage TPU timing: where does the extraction pipeline spend its time?

Breaks the bench path into embed / VAE encode / UNet inversion scan / decode
and prints a JSON stage report plus derived per-UNet-step cost and MXU
utilization estimate.  Run on the TPU host:

    python tools/profile_tpu.py [batch] [steps]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gswm-jax-cache")

sys.path.insert(0, ".")

from gswm.config import GSConfig  # noqa: E402
from gswm.core.decode import recover_message_bits  # noqa: E402
from gswm.core.embed import embed_latents  # noqa: E402
from gswm.pipelines import InversablePipeline  # noqa: E402
from gswm.utils.profiling import device_stats, stage, stage_report  # noqa: E402


import numpy as np  # noqa: E402


def _force(out):
    """Truthful sync: on the tunneled axon platform block_until_ready is a
    no-op, so fetch a tiny reduction of every output to the host."""
    for leaf in jax.tree.leaves(out):
        np.asarray(jnp.sum(jnp.asarray(leaf).astype(jnp.float32)))


def timed(fn, *args, warmup=1, iters=3, **kw):
    for _ in range(warmup):
        _force(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
        _force(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    res = 512

    pipe = InversablePipeline("sd-2-1-base", rng=jax.random.key(0))
    cfg = GSConfig(key_hex="22" * 32, nonce_hex="33" * 16, message="prof",
                   width=res, height=res, message_bits=256)
    images = jax.random.uniform(jax.random.key(9), (batch, 3, res, res))

    report = {}
    t, zT = timed(lambda r: embed_latents(cfg, rng=r, batch=batch)[0],
                  jax.random.key(1))
    report["embed"] = t

    t, lat = timed(pipe.image_to_latents, images)
    report["vae_encode"] = t

    t, z_back = timed(lambda: pipe.invert(latents=lat, num_steps=steps))
    report["unet_inversion_scan"] = t

    t, _bits = timed(lambda: recover_message_bits(z_back, cfg))
    report["decode"] = t

    total = sum(report.values())
    per_step_ms = report["unet_inversion_scan"] / steps * 1e3
    report_out = {
        "batch": batch,
        "steps": steps,
        "stage_seconds": {k: round(v, 4) for k, v in report.items()},
        "stage_share": {k: round(v / total, 3) for k, v in report.items()},
        "unet_ms_per_step_batch": round(per_step_ms, 2),
        "imgs_per_sec": round(batch / total, 3),
        "hbm": device_stats(),
    }
    print(json.dumps(report_out, indent=2))


if __name__ == "__main__":
    main()
