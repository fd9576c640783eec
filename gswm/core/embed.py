"""Fused watermark embed: message -> encrypted bits -> Gaussian latent Z_T.

The reference runs 16,384 scalar Python iterations per image — one
``np.random.uniform`` + ``scipy.stats.norm.ppf`` call per latent element
(gs_insert.py:58-66).  Here the whole map is one fused XLA kernel per image:

    z = ndtri((u + y) / 2**l)

with ``y`` the l-bit window of the ChaCha20-encrypted payload and
``u ~ U(0,1)`` from threefry.  The construction is distribution-preserving:
for y uniform on [0, 2^l) and u uniform on [0,1), (u+y)/2^l is uniform on
[0,1), so z is exactly N(0,1) — the paper's "performance-lossless" property
(tested via Kolmogorov–Smirnov in tests/test_embed_decode.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gswm.config import GSConfig, prepare_message_bytes
from gswm.core import bits as bitops
from gswm.core import chacha


@functools.partial(jax.jit, static_argnames=("l", "shape"))
def _bits_to_latent(cipher_bits, u, l: int, shape):
    """cipher_bits: (capacity_bits,) uint8; u: (elements,) float32 in [0,1).

    Windows the bit stream into l-bit big-endian integers y (gs_insert.py:58-60)
    and applies the inverse-CDF map, reshaping C-order into ``shape``
    (gs_insert.py:65).
    """
    elements = u.shape[0]
    w = cipher_bits.reshape(elements, l).astype(jnp.float32)
    powers = jnp.float32(2) ** jnp.arange(l - 1, -1, -1, dtype=jnp.float32)
    y = w @ powers if l > 1 else w[:, 0]
    p = (u + y) * (0.5**l)
    # fp64-free guard: keep p strictly inside (0,1) so ndtri stays finite.
    tiny = jnp.float32(1e-7)
    p = jnp.clip(p, tiny, 1.0 - tiny)
    z = jax.scipy.special.ndtri(p)
    return z.reshape(shape)


def encrypted_payload_bits(cfg: GSConfig, message_bytes: bytes) -> jax.Array:
    """Diffused payload XOR keystream, on device: (capacity_bits,) uint8.

    Equivalent to ChaCha20-encrypting the tiled message byte-stream
    (gs_insert.py:45-47) — XOR in the bit domain commutes with the
    byte<->bit packing because both use the same stream order.
    """
    key, nonce = cfg.resolve_key_nonce()
    return _cached_payload_bits(key, nonce, message_bytes, cfg.capacity_bits)


@functools.lru_cache(maxsize=32)
def _cached_payload_bits(key: bytes, nonce: bytes, message_bytes: bytes,
                         capacity_bits: int) -> jax.Array:
    """Cipher bits are fixed per (key, nonce, message, capacity) — cached so
    repeated embed calls (batch sweeps, bench passes) skip the keystream +
    XOR dispatches entirely (~30 ms of RPC each on the tunneled runtime)."""
    payload = bitops.diffuse_payload(
        bitops.bytes_to_bits(message_bytes), capacity_bits
    )
    ks = chacha.keystream_bits(key, nonce, capacity_bits)
    return jnp.asarray(payload) ^ ks


@functools.partial(
    jax.jit, static_argnames=("l", "shape", "n_draws", "batch")
)
def _embed_chain(cipher_bits, rng, l: int, shape, n_draws: int, batch: int):
    """uniform draw + bits->latent map + seeded replication as ONE dispatch
    (same RPC-amortization rationale as decode._decode_chain)."""
    elements = shape[0] * shape[1] * shape[2]
    u = jax.random.uniform(rng, (n_draws, elements), dtype=jnp.float32)
    lat = jax.vmap(lambda uu: _bits_to_latent(cipher_bits, uu, l, shape))(u)
    if n_draws == 1 and batch > 1:
        lat = jnp.broadcast_to(lat, (batch,) + lat.shape[1:])
    return lat


def embed_latents(
    cfg: GSConfig,
    rng: Optional[jax.Array] = None,
    batch: int = 1,
    message_bytes: Optional[bytes] = None,
    u: Optional[jax.Array] = None,
    replicate: Optional[bool] = None,
) -> tuple[jax.Array, bytes]:
    """Synthesize watermarked init noise Z_T.

    Returns ``(latents, message_bytes)`` with latents of shape
    (batch, channels, H/8, W/8), float32, marginally N(0,1).

    - ``rng``: jax PRNG key for the per-element uniforms. Defaults to
      ``jax.random.key(cfg.seed)`` (or key(0) when unseeded — pass rng for
      fresh randomness).
    - ``u``: explicit uniforms (batch, elements) for golden-parity tests.
    - ``replicate``: seeded ComfyUI semantics — one latent replicated across
      the batch when seeded, independent latents otherwise (nodes.py:232-238).
      Default: replicate iff cfg.seed is not None.
    """
    cfg = cfg.resolved()
    if message_bytes is None:
        message_bytes = prepare_message_bytes(
            cfg.message, cfg.message_bytes_len, cfg.repeat4
        )
    cipher_bits = encrypted_payload_bits(cfg, message_bytes)

    if replicate is None:
        replicate = cfg.seed is not None
    n_draws = 1 if replicate else batch

    if u is None:
        if rng is None:
            if cfg.seed is not None:
                rng = jax.random.key(cfg.seed)
            else:
                # unseeded and no explicit rng: fresh entropy — a silent
                # fixed default would replicate u across runs and leak the
                # watermark pattern.
                import os as _os

                rng = jax.random.key(int.from_bytes(_os.urandom(4), "little"))
        h, w = cfg.latent_hw
        lat = _embed_chain(cipher_bits, rng, cfg.l, (cfg.channels, h, w),
                           n_draws, batch)
        return lat, message_bytes

    u = jnp.asarray(u, dtype=jnp.float32).reshape(n_draws, cfg.total_elements)
    h, w = cfg.latent_hw
    shape = (cfg.channels, h, w)
    lat = jax.vmap(lambda uu: _bits_to_latent(cipher_bits, uu, cfg.l, shape))(u)
    if replicate and batch > 1:
        lat = jnp.broadcast_to(lat, (batch,) + lat.shape[1:])
    return lat, message_bytes
