"""ChaCha20 keystream generation — TPU-native.

The reference encrypts the diffused payload with `cryptography`'s ChaCha20
(gs_insert.py:45-47, extract.py:77-87).  That API takes a 16-byte "nonce" which
is really ``initial_counter (8B little-endian) || nonce (8B)`` of D.J.
Bernstein's original ChaCha20 (verified empirically against the library — see
tests/test_chacha.py).  Bit-identical keystreams are mandatory: every
extraction of a reference-generated image depends on them (SURVEY.md §7.3).

Three implementations, all bit-identical:
  * ``chacha20_keystream``        — host path via `cryptography` (golden).
  * ``chacha20_keystream_jax``    — pure-jnp uint32 kernel; XLA fuses the 20
                                    rounds into straight-line VPU code.
  * ``chacha20_keystream_pallas`` — Pallas TPU kernel; all 16 state words live
                                    in VMEM as (rows, 128) lanes, one grid step
                                    per row-tile of blocks.

The keystream never leaves the device on the embed path: blocks are generated
directly in HBM and XOR-fused with the payload bits (gswm.core.embed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CONSTANTS = np.array(
    [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574], dtype=np.uint32
)

BLOCK_BYTES = 64
BLOCK_BITS = 512


def key_nonce_to_words(key: bytes, nonce16: bytes) -> tuple[np.ndarray, int, np.ndarray]:
    """Split (key, 16-byte nonce) into (key words[8], initial counter, nonce words[2]).

    Matches `cryptography`'s layout: counter = nonce16[:8] little-endian,
    nonce = nonce16[8:].
    """
    if len(key) != 32 or len(nonce16) != 16:
        raise ValueError("ChaCha20 needs a 32-byte key and 16-byte nonce")
    key_words = np.frombuffer(key, dtype="<u4").astype(np.uint32)
    counter = int.from_bytes(nonce16[:8], "little")
    nonce_words = np.frombuffer(nonce16[8:], dtype="<u4").astype(np.uint32)
    return key_words, counter, nonce_words


# ---------------------------------------------------------------------------
# Pure-jnp core
# ---------------------------------------------------------------------------


def _rotl(x, n):
    return (x << n) | (x >> (32 - n))


def _double_round(x):
    """One column round + one diagonal round on a list of 16 uint32 arrays."""

    def qr(a, b, c, d):
        x[a] = x[a] + x[b]
        x[d] = _rotl(x[d] ^ x[a], 16)
        x[c] = x[c] + x[d]
        x[b] = _rotl(x[b] ^ x[c], 12)
        x[a] = x[a] + x[b]
        x[d] = _rotl(x[d] ^ x[a], 8)
        x[c] = x[c] + x[d]
        x[b] = _rotl(x[b] ^ x[c], 7)

    qr(0, 4, 8, 12)
    qr(1, 5, 9, 13)
    qr(2, 6, 10, 14)
    qr(3, 7, 11, 15)
    qr(0, 5, 10, 15)
    qr(1, 6, 11, 12)
    qr(2, 7, 8, 13)
    qr(3, 4, 9, 14)
    return x


def _chacha_core(init):
    """20 ChaCha rounds + feed-forward.  ``init``: list of 16 same-shape
    uint32 arrays (the per-block state, vectorized over blocks)."""
    x = list(init)
    for _ in range(10):
        x = _double_round(x)
    return [xi + ii for xi, ii in zip(x, init)]


def _block_states(key_words, counter0_lo, counter0_hi, nonce_words, block_idx):
    """Build the 16-word state for each block index (uint32 arrays).

    64-bit counter = counter0 + block_idx with carry, done in uint32 pairs so
    it works without jax x64.
    """
    lo = counter0_lo + block_idx
    carry = (lo < block_idx).astype(jnp.uint32)
    hi = counter0_hi + carry
    shape = block_idx.shape
    bcast = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.uint32), shape)
    state = [bcast(c) for c in _CONSTANTS.tolist()]
    state += [bcast(key_words[k]) for k in range(8)]
    state += [lo, hi]
    state += [bcast(nonce_words[k]) for k in range(2)]
    return state


@functools.partial(jax.jit, static_argnames=("n_blocks",))
def _keystream_words_xla(key_words, counter0_lo, counter0_hi, nonce_words, n_blocks):
    idx = jnp.arange(n_blocks, dtype=jnp.uint32)
    init = _block_states(key_words, counter0_lo, counter0_hi, nonce_words, idx)
    out = _chacha_core(init)
    return jnp.stack(out, axis=-1)  # (n_blocks, 16) uint32


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

_LANES = 128
_SUBLANES = 8  # one (8, 128) uint32 tile of blocks per grid step


def _chacha_pallas_kernel(scalars_ref, out_ref):
    """Compute one (SUBLANES, LANES)-tile of ChaCha blocks.

    scalars_ref: SMEM (12,) uint32 = key_words[8], counter_lo, counter_hi,
    nonce_words[2].  out_ref: VMEM (16, SUBLANES, LANES) uint32 — word-major so
    each word is a contiguous tile.
    """
    i = pl.program_id(0)
    base = jnp.uint32(i * _SUBLANES * _LANES)
    row = jax.lax.broadcasted_iota(jnp.uint32, (_SUBLANES, _LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.uint32, (_SUBLANES, _LANES), 1)
    idx = base + row * jnp.uint32(_LANES) + col

    lo = scalars_ref[8] + idx
    carry = (lo < idx).astype(jnp.uint32)
    hi = scalars_ref[9] + carry
    ones = jnp.ones((_SUBLANES, _LANES), jnp.uint32)

    init = [jnp.uint32(c) * ones for c in _CONSTANTS.tolist()]
    init += [scalars_ref[k] * ones for k in range(8)]
    init += [lo, hi, scalars_ref[10] * ones, scalars_ref[11] * ones]

    out = _chacha_core(init)
    for w in range(16):
        out_ref[w, :, :] = out[w]


@functools.partial(jax.jit, static_argnames=("n_blocks", "interpret"))
def _keystream_words_pallas(key_words, counter0_lo, counter0_hi, nonce_words,
                            n_blocks, interpret: bool = False):
    tile = _SUBLANES * _LANES
    n_tiles = -(-n_blocks // tile)
    scalars = jnp.concatenate(
        [
            key_words.astype(jnp.uint32),
            jnp.stack([counter0_lo, counter0_hi]).astype(jnp.uint32),
            nonce_words.astype(jnp.uint32),
        ]
    )
    out = pl.pallas_call(
        _chacha_pallas_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (16, _SUBLANES, _LANES),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((16, n_tiles * _SUBLANES, _LANES), jnp.uint32),
        interpret=interpret,
    )(scalars)
    # (16, rows, 128) -> (n_blocks, 16)
    words = out.reshape(16, n_tiles * tile).T
    return words[:n_blocks]


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _default_backend() -> str:
    return "pallas" if jax.default_backend() not in ("cpu",) else "xla"


def keystream_words(
    key: bytes, nonce16: bytes, n_blocks: int, backend: str | None = None
) -> jax.Array:
    """Keystream as (n_blocks, 16) uint32 words on device."""
    key_words, counter0, nonce_words = key_nonce_to_words(key, nonce16)
    lo = jnp.uint32(counter0 & 0xFFFFFFFF)
    hi = jnp.uint32(counter0 >> 32)
    kw = jnp.asarray(key_words)
    nw = jnp.asarray(nonce_words)
    backend = backend or _default_backend()
    if backend == "pallas":
        # interpreter mode off-TPU so the kernel has CI coverage on CPU
        # (same pattern as gswm.ops.attention)
        interpret = jax.default_backend() != "tpu"
        return _keystream_words_pallas(kw, lo, hi, nw, n_blocks,
                                       interpret=interpret)
    return _keystream_words_xla(kw, lo, hi, nw, n_blocks)


def words_to_bits(words: jax.Array) -> jax.Array:
    """(n_blocks, 16) uint32 -> (n_blocks*512,) uint8 bits in *stream order*.

    Stream order = bytes little-endian within each word, bits MSB-first within
    each byte — exactly the order of ``''.join(format(byte, '08b') ...)`` over
    the byte stream (gs_insert.py:49).
    """
    j = jnp.arange(32, dtype=jnp.uint32)
    byte_k = j // 8
    bit_p = j % 8
    shifts = 8 * byte_k + (7 - bit_p)  # (32,)
    bits = (words[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(words.shape[0] * BLOCK_BITS).astype(jnp.uint8)


def keystream_bits(
    key: bytes, nonce16: bytes, n_bits: int, backend: str | None = None
) -> jax.Array:
    """First ``n_bits`` keystream bits, stream order, on device."""
    n_blocks = -(-n_bits // BLOCK_BITS)
    return words_to_bits(keystream_words(key, nonce16, n_blocks, backend))[:n_bits]


def chacha20_keystream_jax(
    key: bytes, nonce16: bytes, n_bytes: int, backend: str | None = None
) -> np.ndarray:
    """Keystream bytes via the device kernel (host copy, mainly for tests)."""
    n_blocks = -(-n_bytes // BLOCK_BYTES)
    words = np.asarray(keystream_words(key, nonce16, n_blocks, backend))
    return words.astype("<u4").tobytes()[:n_bytes]


def chacha20_keystream(key: bytes, nonce16: bytes, n_bytes: int) -> bytes:
    """Golden host path via `cryptography` (same library as the reference)."""
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

    cipher = Cipher(algorithms.ChaCha20(key, nonce16), mode=None)
    return cipher.encryptor().update(b"\x00" * n_bytes)
