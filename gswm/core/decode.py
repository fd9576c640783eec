"""Watermark extraction: inverted latent Z_T -> message bits.

Replaces the reference decode loop (extract.py:72-101): a per-element
``np.nditer`` with a scipy ``norm.cdf`` call each (extract.py:82-84), plus
string-based bit handling.  Here the quantize + decrypt + majority-vote chain
is a single fused XLA computation over the whole (batched) latent.

Semantics preserved exactly:
  * quantize: y = floor(ndtr(z) * 2^l), clipped to 2^l - 1 (the reference's
    ``int(norm.cdf(z) * 2**l)``; for l=1 this is the sign test z >= 0).
  * decrypt:  XOR with the same ChaCha20 keystream (stream order).
  * vote:     per-bit-position strict majority over the redundant copies —
    count_1 > n_segments/2, ties -> 0 (extract.py:97-99).  Only complete
    segments vote; the zero-filled remainder (if any) is excluded (the
    reference never produces a partial segment for its power-of-two configs).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gswm.config import GSConfig
from gswm.core import bits as bitops
from gswm.core import chacha


@functools.partial(jax.jit, static_argnames=("l",))
def quantize_latent_bits(latents: jax.Array, l: int) -> jax.Array:
    """(..., C, h, w) latents -> (..., elements*l) uint8 bits, stream order."""
    z = latents.astype(jnp.float32)
    flat = z.reshape(z.shape[: -3] + (-1,))  # C-order, matches embed fill
    y = jnp.floor(jax.scipy.special.ndtr(flat) * (2.0**l))
    y = jnp.clip(y, 0, 2**l - 1).astype(jnp.uint8)
    if l == 1:
        return y
    shifts = jnp.arange(l - 1, -1, -1, dtype=jnp.uint8)
    bits = (y[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(bits.shape[:-2] + (-1,))


@functools.partial(jax.jit, static_argnames=("l", "message_bits"))
def _decode_chain(latents: jax.Array, keystream: jax.Array, l: int,
                  message_bits: int) -> jax.Array:
    """quantize + XOR-decrypt + majority vote as ONE dispatch.

    The three stages are individually jitted above for unit tests, but the
    hot extraction path calls this fused chain: on the tunneled runtime
    every eager dispatch costs ~30 ms of RPC, so the XOR between two jits
    alone was a measurable slice of the wall-minus-device gap
    (docs/BENCH.md round-3 budget).
    """
    m_bits = quantize_latent_bits(latents, l)
    payload = m_bits ^ keystream
    return majority_vote(payload, message_bits)


@functools.lru_cache(maxsize=32)
def _cached_keystream(key: bytes, nonce: bytes, n_bits: int) -> jax.Array:
    """Keystream bits for a fixed (key, nonce) — reused across batch decode
    calls (the reference recomputes the cipher per image, extract.py:77-87)."""
    return chacha.keystream_bits(key, nonce, n_bits)


@functools.partial(jax.jit, static_argnames=("message_bits",))
def majority_vote(payload_bits: jax.Array, message_bits: int) -> jax.Array:
    """(..., capacity_bits) decrypted bits -> (..., message_bits) voted bits."""
    cap = payload_bits.shape[-1]
    segments = cap // message_bits
    segs = payload_bits[..., : segments * message_bits].reshape(
        payload_bits.shape[:-1] + (segments, message_bits)
    )
    count_1 = jnp.sum(segs, axis=-2, dtype=jnp.int32)
    # strict majority, tie -> 0 (extract.py:99)
    return (count_1 * 2 > segments).astype(jnp.uint8)


def recover_message_bits(
    latents: jax.Array, cfg: GSConfig, keystream: Optional[jax.Array] = None
) -> jax.Array:
    """Full decode chain on device. latents: (B, C, h, w) or (C, h, w).

    Returns voted message bits of shape (..., message_bits) as uint8.
    """
    cfg = cfg.resolved()
    if keystream is None:
        key, nonce = cfg.resolve_key_nonce()
        keystream = _cached_keystream(key, nonce, cfg.capacity_bits)
    return _decode_chain(jnp.asarray(latents), keystream, cfg.l,
                         cfg.resolved_message_bits)


def decode_latents(latents: jax.Array, cfg: GSConfig) -> str | list[str]:
    """Decode to binary string(s) — the reference's return type
    (extract.py:95-101)."""
    voted = np.asarray(recover_message_bits(latents, cfg))
    if voted.ndim == 1:
        return bitops.bits_to_bin_str(voted)
    return [bitops.bits_to_bin_str(v) for v in voted]
