"""Embed CLI — watermark latent synthesis (and txt2img when weights exist).

Plays the role of the reference's SD-CLI patch recipe (README.md:107-145):
``--message/--key_hex/--nonce_hex`` produce watermarked Z_T init noise, which
either feeds our own pipeline (--model_dir + --prompt) or is saved as .npy
for any external sampler.  Key material is logged to info_data.txt exactly
like the reference (gs_insert.py:68-74) plus a jsonl mirror.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from gswm.config import GSConfig, prepare_message_bytes
from gswm.core.embed import embed_latents
from gswm.eval.registry import KeyRegistry


def build_parser():
    p = argparse.ArgumentParser(description="Generate GS-watermarked init noise")
    p.add_argument("--message", default="")
    p.add_argument("--key_hex", default="")
    p.add_argument("--nonce_hex", default="")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--message_length", type=int, default=-1,
                   help="-1 = auto capacity table (nodes.py:26-49)")
    p.add_argument("--l", type=int, default=1)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--use_repeat", action="store_true",
                   help="A1111 semantics: quarter-size message tiled x4")
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--outdir", default="outputs")
    # generation (optional, needs local weights)
    p.add_argument("--model_dir", default="")
    p.add_argument("--preset", default="sd-2-1-base")
    p.add_argument("--prompt", default="")
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--scheduler", default="DDIM", choices=["DDIM", "DPMs"])
    return p


def main(argv=None):
    from gswm.utils.platform import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    cfg = GSConfig(
        key_hex=args.key_hex,
        nonce_hex=args.nonce_hex,
        message=args.message,
        message_bits=args.message_length,
        l=args.l,
        width=args.width,
        height=args.height,
        seed=args.seed,
        repeat4=args.use_repeat,
    ).resolved()

    os.makedirs(args.outdir, exist_ok=True)
    msg = prepare_message_bytes(cfg.message, cfg.message_bytes_len, cfg.repeat4)

    import jax

    rng = jax.random.key(cfg.seed if cfg.seed is not None else
                         int.from_bytes(os.urandom(4), "little"))
    latents, msg = embed_latents(cfg, rng=rng, batch=args.n_samples,
                                 message_bytes=msg)

    key, nonce = cfg.resolve_key_nonce()
    registry = KeyRegistry(args.outdir)
    registry.record(key, nonce, msg, seed=cfg.seed, height=cfg.height,
                    width=cfg.width, message_length=cfg.resolved_message_bits)

    lat_path = os.path.join(args.outdir, "gs_latents.npy")
    np.save(lat_path, np.asarray(latents))
    print(f"latents: {latents.shape} -> {lat_path}")
    print(f"key_hex: {cfg.key_hex}")
    print(f"nonce_hex: {cfg.nonce_hex}")
    print(f"message_hex: {msg.hex()}")

    if args.model_dir or args.prompt:
        from gswm.pipelines import InversablePipeline

        pipe = InversablePipeline(args.preset,
                                  model_dir=args.model_dir or None)
        ids = None
        if args.prompt and args.model_dir:
            from gswm.models.text import load_tokenizer

            tok = load_tokenizer(args.model_dir)
            ids = tok([args.prompt] * args.n_samples, padding="max_length",
                      max_length=77, truncation=True,
                      return_tensors="np").input_ids
        imgs = pipe.generate(latents, prompt_ids=ids,
                             guidance_scale=args.guidance_scale,
                             num_steps=args.num_inference_steps,
                             scheduler=args.scheduler)
        from PIL import Image

        for i, im in enumerate(np.asarray(imgs)):
            arr = (im.transpose(1, 2, 0) * 255).round().astype(np.uint8)
            path = os.path.join(args.outdir, f"gs_{i:05d}.png")
            Image.fromarray(arr).save(path)
            print(f"image -> {path}")


if __name__ == "__main__":
    main()
