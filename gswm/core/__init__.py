"""L1 watermark core: the only algorithmic IP of the system (SURVEY.md §1).

Pure JAX, no model dependencies. Everything here is jit-able, batched, and
designed to fuse into a handful of XLA/Pallas kernels on TPU — replacing the
reference's 16,384-iteration scalar Python loops (gs_insert.py:58-66,
extract.py:82-84).
"""

# Only leaf modules here: embed/decode depend on gswm.config, which imports
# gswm.core.capacity — keeping them out of this __init__ avoids the cycle.
# (gswm/__init__ re-exports embed_latents/decode_latents at the top level.)
from gswm.core.capacity import choose_watermark_length  # noqa: F401
from gswm.core.chacha import chacha20_keystream, chacha20_keystream_jax  # noqa: F401
