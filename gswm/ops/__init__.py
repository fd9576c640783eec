"""Custom TPU kernels (Pallas) beyond what XLA fuses on its own:

  attention.py — blockwise flash attention for SDXL-scale latent sequences
                 (4x128x128 latents -> 16k tokens; SURVEY.md §5 long-context
                 analog)
  ring_attention.py — sequence-parallel attention over an `sp` mesh axis
                 (K/V shards rotate the ICI ring via ppermute)
  chacha (in gswm.core.chacha) — keystream generation on VPU lanes
"""

from gswm.ops.attention import flash_attention  # noqa: F401
from gswm.ops.ring_attention import ring_attention  # noqa: F401
