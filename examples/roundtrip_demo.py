"""End-to-end Gaussian Shading roundtrip on the tiny preset (no weights
needed, runs on CPU in ~2 minutes; swap preset/model_dir for real use).

Demonstrates the full reference workflow (README.md:107-145 embed recipe +
extract.py:46-117 extraction) through gswm's API:

  1. embed a message into watermarked initial noise Z_T,
  2. generate an image from it (the host-sampler role),
  3. attack the image (JPEG),
  4. invert the attacked image back to Z_T and decode the message,
  5. score bit accuracy + detection p-value.

Run:  JAX_PLATFORMS=cpu python examples/roundtrip_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from gswm.config import GSConfig
from gswm.core import bits as bitops
from gswm.core.decode import recover_message_bits
from gswm.core.embed import embed_latents
from gswm.eval.detection import bit_match_pvalue
from gswm.pipelines import InversablePipeline
from gswm.utils.fitting import fit_vae_roundtrip


def main():
    # tiny preset: structurally a mini-SD; fit its VAE so pixels roundtrip
    pipe = InversablePipeline("tiny", rng=jax.random.key(0))
    fit_vae_roundtrip(pipe)

    cfg = GSConfig(
        key_hex="22" * 32,          # ChaCha20 key (os.urandom(32) in prod)
        nonce_hex="",               # empty -> derived key_hex[16:48]
        message="lthero",
        width=32, height=32, vae_scale=2, message_bits=32,
    )

    # 1. embed: message -> encrypted, repeated, distribution-preserving Z_T
    zT, message_bytes = embed_latents(cfg, rng=jax.random.key(1), batch=4)

    # 2. generate (the role the reference hands to A1111/ComfyUI samplers)
    images = pipe.generate(zT, guidance_scale=1.0, num_steps=20)

    # 3. attack: JPEG quality 75 via the host libjpeg path
    from gswm.distortions.attacks import apply_single_distortion
    from PIL import Image

    attacked = []
    for im in np.asarray(images):
        pil = Image.fromarray(
            (im.transpose(1, 2, 0) * 255).astype(np.uint8))
        pil = apply_single_distortion(pil, "compression", 75)
        attacked.append(
            np.transpose(np.asarray(pil, np.float32) / 255.0, (2, 0, 1)))
    attacked = np.stack(attacked)

    # 4. invert + decode (extract.py:46-101 equivalents, one jitted scan)
    z_back = pipe.invert(images=attacked, num_steps=20)
    voted = np.asarray(recover_message_bits(z_back, cfg))

    # 5. score
    expected = bitops.bytes_to_bits(message_bytes)
    for i, row in enumerate(voted):
        acc = float(np.mean(row == expected))
        p = bit_match_pvalue(int((row == expected).sum()), len(expected))
        print(f"image {i}: bit accuracy {acc:.3f}   p-value {p:.2e}")


if __name__ == "__main__":
    main()
