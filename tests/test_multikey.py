"""Multi-key batched embed/decode: per-row parity with the single-key core
and end-to-end attribution over a many-key batch."""

import jax
import numpy as np
import pytest

from gswm.config import GSConfig
from gswm.core import bits as bitops
from gswm.core.chacha import chacha20_keystream
from gswm.core.decode import recover_message_bits
from gswm.core.embed import embed_latents
from gswm.core.multikey import (
    batch_keystream_bits,
    embed_latents_multikey,
    recover_message_bits_multikey,
)
from gswm.eval.trace import find_source


def _material(n, seed=0):
    rng = np.random.default_rng(seed)
    keys = [rng.bytes(32) for _ in range(n)]
    nonces = [rng.bytes(16) for _ in range(n)]
    msgs = [rng.bytes(32) for _ in range(n)]
    return keys, nonces, msgs


def test_batch_keystream_matches_library():
    keys, nonces, _ = _material(5)
    bits = np.asarray(batch_keystream_bits(keys, nonces, 2048))
    for i in range(5):
        want = np.unpackbits(np.frombuffer(
            chacha20_keystream(keys[i], nonces[i], 256), np.uint8))
        np.testing.assert_array_equal(bits[i], want)


def test_multikey_roundtrip():
    cfg = GSConfig(message_bits=256)
    keys, nonces, msgs = _material(6, seed=1)
    lat, msg_bytes = embed_latents_multikey(cfg, keys, nonces, msgs,
                                            rng=jax.random.key(2))
    assert lat.shape == (6, 4, 64, 64)
    voted = np.asarray(recover_message_bits_multikey(lat, cfg, keys, nonces))
    for i in range(6):
        np.testing.assert_array_equal(
            voted[i], bitops.bytes_to_bits(msg_bytes[i]))
    # decoding row i with key j != i must fail to chance
    voted_wrong = np.asarray(recover_message_bits_multikey(
        lat, cfg, keys[1:] + keys[:1], nonces[1:] + nonces[:1]))
    acc = np.mean(voted_wrong[0] == bitops.bytes_to_bits(msg_bytes[0]))
    assert 0.3 < acc < 0.7


def test_multikey_row_matches_single_key_core():
    cfg = GSConfig(message_bits=256)
    keys, nonces, msgs = _material(3, seed=2)
    lat, msg_bytes = embed_latents_multikey(cfg, keys, nonces, msgs,
                                            rng=jax.random.key(3))
    # single-key decode of row 1 agrees
    cfg1 = GSConfig(key_hex=keys[1].hex(), nonce_hex=nonces[1].hex(),
                    message_bits=256)
    voted = np.asarray(recover_message_bits(lat[1], cfg1))
    np.testing.assert_array_equal(voted, bitops.bytes_to_bits(msg_bytes[1]))


def test_multikey_attribution_via_trace():
    """Serving loop: registry of 20 users, recover + attribute one latent."""
    cfg = GSConfig(message_bits=256)
    keys, nonces, msgs = _material(20, seed=3)
    lat, msg_bytes = embed_latents_multikey(cfg, keys, nonces, msgs,
                                            rng=jax.random.key(4))
    records = [
        {"key_hex": k.hex(), "nonce_hex": n.hex(), "message_hex": m.hex(),
         "message_length": 256}
        for k, n, m in zip(keys, nonces, msg_bytes)
    ]
    best, acc, _ = find_source(np.asarray(lat)[13], records)
    assert best == 13 and acc == 1.0
