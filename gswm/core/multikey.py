"""Multi-key / multi-message batching (BASELINE config 5).

Serving scenario: every image in a 10k batch carries its OWN key/nonce/
message (per-user traceability).  The reference can only loop its scalar
embed per image; here the ChaCha20 state init is batched over keys — one
vmapped kernel emits every keystream, and embed/decode stay single fused XLA
computations over the whole batch.

Geometry (width/height/l/message_bits) is shared across the batch — the
natural serving shape; mixed geometries are separate calls.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gswm.config import GSConfig, prepare_message_bytes
from gswm.core import bits as bitops
from gswm.core import chacha
from gswm.core.decode import majority_vote, quantize_latent_bits
from gswm.core.embed import _bits_to_latent


@functools.partial(jax.jit, static_argnames=("n_blocks",))
def _keystream_words_batch(key_words, counter_lo, counter_hi, nonce_words,
                           n_blocks):
    """(B, 8) key words + per-image counters/nonces -> (B, n_blocks, 16)."""

    def one(kw, lo, hi, nw):
        idx = jnp.arange(n_blocks, dtype=jnp.uint32)
        init = chacha._block_states(kw, lo, hi, nw, idx)
        out = chacha._chacha_core(init)
        return jnp.stack(out, axis=-1)

    return jax.vmap(one)(key_words, counter_lo, counter_hi, nonce_words)


def batch_keystream_bits(keys: Sequence[bytes], nonces: Sequence[bytes],
                         n_bits: int) -> jax.Array:
    """(B, n_bits) uint8 keystream bits, one key/nonce pair per row."""
    kw, lo, hi, nw = [], [], [], []
    for key, nonce in zip(keys, nonces):
        k, counter, n = chacha.key_nonce_to_words(key, nonce)
        kw.append(k)
        lo.append(counter & 0xFFFFFFFF)
        hi.append(counter >> 32)
        nw.append(n)
    n_blocks = -(-n_bits // chacha.BLOCK_BITS)
    words = _keystream_words_batch(
        jnp.asarray(np.stack(kw)),
        jnp.asarray(np.asarray(lo, np.uint32)),
        jnp.asarray(np.asarray(hi, np.uint32)),
        jnp.asarray(np.stack(nw)),
        n_blocks,
    )
    bits = jax.vmap(chacha.words_to_bits)(words)
    return bits[:, :n_bits]


def embed_latents_multikey(
    cfg: GSConfig,
    keys: Sequence[bytes],
    nonces: Sequence[bytes],
    messages: Sequence[bytes | str],
    rng: Optional[jax.Array] = None,
) -> tuple[jax.Array, list[bytes]]:
    """Per-image keys/messages -> (B, C, h, w) watermarked latents."""
    cfg = cfg.resolved()
    b = len(keys)
    assert len(nonces) == b and len(messages) == b
    msg_bytes = [
        prepare_message_bytes(m, cfg.message_bytes_len, cfg.repeat4)
        for m in messages
    ]
    payload = np.stack([
        bitops.diffuse_payload(bitops.bytes_to_bits(m), cfg.capacity_bits)
        for m in msg_bytes
    ])
    ks = batch_keystream_bits(keys, nonces, cfg.capacity_bits)
    cipher = jnp.asarray(payload) ^ ks

    if rng is None:
        # Mirror embed.py: unseeded means fresh entropy — a fixed default key
        # would replicate u across serving batches and leak the watermark
        # structure.
        import os as _os

        rng = jax.random.key(int.from_bytes(_os.urandom(4), "little"))
    u = jax.random.uniform(rng, (b, cfg.total_elements), dtype=jnp.float32)
    h, w = cfg.latent_hw
    shape = (cfg.channels, h, w)
    lat = jax.vmap(lambda cb, uu: _bits_to_latent(cb, uu, cfg.l, shape))(
        cipher, u
    )
    return lat, msg_bytes


def recover_message_bits_multikey(
    latents: jax.Array,
    cfg: GSConfig,
    keys: Sequence[bytes],
    nonces: Sequence[bytes],
) -> jax.Array:
    """(B, C, h, w) latents decoded under per-image keys -> (B, msg_bits)."""
    cfg = cfg.resolved()
    ks = batch_keystream_bits(keys, nonces, cfg.capacity_bits)
    m_bits = quantize_latent_bits(jnp.asarray(latents), cfg.l)
    payload = m_bits ^ ks
    return majority_vote(payload, cfg.resolved_message_bits)
