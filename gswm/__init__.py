"""gswm — TPU-native Gaussian Shading watermarking for diffusion models.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of
lthero-big/A-watermark-for-Diffusion-Models (see SURVEY.md): embed an encrypted,
redundantly-coded message into the initial Gaussian noise Z_T of a diffusion
sampling run, and recover it from a published image by exact DDIM / DPM++
inversion, sign-quantization, ChaCha20 decryption, and majority voting.

Layers (bottom-up, mirroring SURVEY.md §1):
  core/         L1 watermark math (ChaCha20 keystream, bit diffusion, fused embed/decode)
  models/       Flax CLIP-text / UNet2DCondition / AutoencoderKL + HF weight loaders
  schedulers/   DDIM, DDIM-inverse, DPM++ 2M, DPM++ 2M-inverse as pure jittable fns
  pipelines/    InversablePipeline — generate(Z_T)->image AND invert(image)->Z_T
  distortions/  WAVES-style 16-attack robustness bench (batched on-device + PIL-exact)
  sharding/     jax.sharding.Mesh setup, DP/TP shardings
  eval/         bit-accuracy metrics, sweep drivers, jsonl + reference-parity reports
  cli/          gs-embed / gs-extract / gs-distort command-line entry points
  integrations/ ComfyUI-node and A1111-script shaped surfaces
"""

__version__ = "0.1.0"

from gswm.config import GSConfig  # noqa: F401
from gswm.core.embed import embed_latents  # noqa: F401
from gswm.core.decode import decode_latents, recover_message_bits  # noqa: F401
from gswm.eval.metrics import calculate_bit_accuracy  # noqa: F401
