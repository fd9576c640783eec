"""First-real-weights gate (VERDICT r3 next #9).

Everything offline-provable about real-checkpoint support is already proven
(bijective key manifests, block-math parity vs torch re-derivations, real
torch CLIP) — but no Stable Diffusion checkpoint has ever been run
end-to-end because none exists in this offline environment.  The day a
weights directory is available, THIS script is the gate: one command that
loads it, spot-checks the conversion, runs the full watermark roundtrip at
512x512, and prints a single PASS/FAIL verdict line.

    python tools/real_checkpoint_gate.py /path/to/stable-diffusion-2-1-base \
        [--preset sd-2-1-base] [--res 512] [--steps 30] [--batch 4]

Expected layout (diffusers): unet/diffusion_pytorch_model.safetensors,
vae/..., text_encoder/model.safetensors (gswm.models.loader docstring).

Checks, in order (each cites what it certifies):
  1. load     — every checkpoint tensor maps onto our Flax trees
                (loader._check_against raises on missing/extra/mis-shaped).
  2. vae      — decode->encode sign fidelity at the working latent scale
                must be >= 0.95 (a real SD VAE is near-lossless for the
                posterior mean; extract.py:39-43 depends on it).
  3. text    — empty-prompt context is finite and non-degenerate
                (extract.py:66 inverts under the "" prompt).
  4. lossless — embed -> generate(guidance 1.0) -> invert -> decode bit
                accuracy >= 0.99 (BASELINE.md row 1: 100% lossless; the
                reference's acceptance example is accuracy 1.0 on a QF=95
                JPEG, README.md:282-285).
  5. jpeg95  — the reference's acceptance example: QF=95 host-libjpeg
                round-trip, accuracy >= 0.95.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--preset", default="sd-2-1-base")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--scheduler", default="DDIM", choices=("DDIM", "DPMs"))
    args = ap.parse_args()

    from gswm.utils.platform import apply_platform_env

    apply_platform_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gswm.config import GSConfig
    from gswm.core import bits as bitops
    from gswm.core.decode import recover_message_bits
    from gswm.core.embed import embed_latents
    from gswm.models.vae import AutoencoderKL
    from gswm.pipelines import InversablePipeline

    checks: list[tuple[str, bool, str]] = []

    def record(name: str, ok: bool, detail: str):
        checks.append((name, bool(ok), detail))
        print(f"  [{'ok' if ok else 'FAIL'}] {name}: {detail}", flush=True)

    t0 = time.time()
    # 1. load — loader raises on any missing/extra/mis-shaped tensor
    try:
        pipe = InversablePipeline(args.preset, model_dir=args.model_dir,
                                  rng=jax.random.key(0))
        record("load", True, f"all checkpoint tensors mapped "
                             f"({args.model_dir})")
    except Exception as e:
        record("load", False, f"{type(e).__name__}: {e}")
        print(f"GATE: FAIL (load) in {time.time()-t0:.0f}s")
        return 1

    f = 2 ** (len(pipe.preset.vae.block_out_channels) - 1)
    h = args.res // f
    cfg = GSConfig(key_hex="22" * 32, nonce_hex="33" * 16,
                   message="lthero", width=args.res, height=args.res,
                   vae_scale=f, message_bits=256)

    # 2. vae sign fidelity at working scale
    z = 14.0 * jax.random.normal(
        jax.random.key(3), (2, pipe.preset.vae.latent_channels, h, h))

    @jax.jit
    def roundtrip(params, z):
        img = pipe.vae.apply(params, z, method=AutoencoderKL.decode)
        img = jnp.clip(img, -1.0, 1.0)
        return pipe.vae.apply(params, img, method=AutoencoderKL.encode)

    zb = np.asarray(roundtrip(pipe.vae_params, z))
    fid = float(np.mean(np.sign(zb) == np.sign(np.asarray(z))))
    record("vae", fid >= 0.95, f"decode->encode sign fidelity {fid:.4f}")

    # 3. empty-prompt context sanity
    ctx = np.asarray(pipe.empty_context(1))
    record("text", bool(np.isfinite(ctx).all() and ctx.std() > 1e-3),
           f"empty-prompt context std {ctx.std():.4f}")

    # 4. lossless roundtrip
    zT, msg = embed_latents(cfg, rng=jax.random.key(1), batch=args.batch)
    expected = bitops.bytes_to_bits(msg)
    images = pipe.generate(zT, guidance_scale=1.0, num_steps=args.steps,
                           scheduler=args.scheduler)
    z_back = pipe.invert(images=images, num_steps=args.steps,
                         scheduler=args.scheduler)
    voted = np.asarray(recover_message_bits(z_back, cfg))
    acc = float(np.mean(voted == expected[None, :]))
    record("lossless", acc >= 0.99, f"bit accuracy {acc:.4f} "
                                    f"({args.steps}-step {args.scheduler})")

    # 5. the reference's acceptance example: QF=95 JPEG (README.md:282-285)
    from gswm.eval.sweep import _host_jpeg

    jp = jnp.asarray(_host_jpeg(images, 95))
    voted95 = np.asarray(recover_message_bits(
        pipe.invert(images=jp, num_steps=args.steps,
                    scheduler=args.scheduler), cfg))
    acc95 = float(np.mean(voted95 == expected[None, :]))
    record("jpeg95", acc95 >= 0.95, f"bit accuracy {acc95:.4f}")

    # Optional deep check: if torch + the checkpoint's text encoder are
    # available, the block-parity suite pins layer math against the real
    # torch modules — point the suite at the directory and run it.
    print("  note: for block-level parity vs torch, run "
          "`GSWM_REAL_CKPT_DIR=%s python -m pytest "
          "tests/test_block_diffusers_parity.py tests/test_loader.py -q`"
          % args.model_dir)

    ok = all(c[1] for c in checks)
    failed = ",".join(c[0] for c in checks if not c[1]) or "none"
    print(f"GATE: {'PASS' if ok else 'FAIL'} "
          f"({len([c for c in checks if c[1]])}/{len(checks)} checks, "
          f"failed: {failed}) in {time.time()-t0:.0f}s — preset "
          f"{args.preset}, {args.res}x{args.res}, {args.steps}-step "
          f"{args.scheduler}, batch {args.batch}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
