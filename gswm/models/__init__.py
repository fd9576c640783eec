"""Flax model zoo: UNet2DCondition, AutoencoderKL, CLIP text encoder.

TPU-first design decisions (vs the reference's torch/diffusers stack,
extract.py:56-69):
  * NHWC activations everywhere (TPU conv layout); NCHW only at the public
    boundary, matching the reference's (B, 4, H/8, W/8) latent convention.
  * bf16 compute / fp32 params and fp32 scheduler state (SURVEY.md §7.3:
    bf16's 8-bit mantissa near the sign boundary costs bit accuracy).
  * attention sized for MXU tiles; optional tensor-parallel sharding
    constraints on head/ffn dims (gswm.sharding).
  * HF safetensors checkpoints load via gswm.models.loader (offline-safe:
    architecture works with random init; weights attach when present).
"""

from gswm.models.configs import (  # noqa: F401
    UNetConfig,
    VAEConfig,
    SD_1_4,
    SD_2_1_BASE,
    SD_2_1_768,
    TINY,
)
from gswm.models.unet import UNet2DCondition  # noqa: F401
from gswm.models.vae import AutoencoderKL  # noqa: F401
