"""Core embed/decode: golden parity vs the NumPy re-derivation, closed-loop
roundtrip (BASELINE config 1), distribution preservation, and quirk coverage
(key/nonce fallback, capacity table, tie->0 voting)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from gswm.config import GSConfig, prepare_message_bytes, resolve_key_nonce
from gswm.compat import reference_decode_numpy, reference_embed_numpy
from gswm.core import bits as bitops
from gswm.core.capacity import choose_watermark_length
from gswm.core.decode import decode_latents, majority_vote, recover_message_bits
from gswm.core.embed import embed_latents
from gswm.eval.metrics import calculate_bit_accuracy

KEY_HEX = "5822ff9cce6772f714192f43863f6bad1bf54b78326973897e6b66c3186b77a7"
NONCE_HEX = "05072fd1c2265f6f2e2a4080a2bfbdd8"


def _cfg(**kw):
    base = dict(key_hex=KEY_HEX, nonce_hex=NONCE_HEX, message="lthero")
    base.update(kw)
    return GSConfig(**base)


def test_roundtrip_lossless_512():
    """BASELINE config 1: 256-bit msg -> Z_T -> direct quantize/decode, 100%."""
    cfg = _cfg(message_bits=256)
    lat, msg = embed_latents(cfg, rng=jax.random.key(7))
    assert lat.shape == (1, 4, 64, 64)
    voted = recover_message_bits(lat, cfg)
    np.testing.assert_array_equal(
        np.asarray(voted)[0], bitops.bytes_to_bits(msg)
    )
    # hex-level accuracy == 1.0 via the reference metric
    binstr = decode_latents(lat[0], cfg)
    _, acc = calculate_bit_accuracy(msg.hex(), binstr)
    assert acc == 1.0


@pytest.mark.parametrize(
    "width,height,message_bits,l",
    [
        (512, 512, 256, 1),
        (512, 1024, -1, 1),
        (768, 768, 128, 1),
        (512, 512, 64, 2),
        (256, 256, 32, 1),
    ],
)
def test_roundtrip_shapes(width, height, message_bits, l):
    cfg = _cfg(width=width, height=height, message_bits=message_bits, l=l)
    lat, msg = embed_latents(cfg, rng=jax.random.key(3))
    voted = np.asarray(recover_message_bits(lat, cfg))[0]
    np.testing.assert_array_equal(voted, bitops.bytes_to_bits(msg))


def test_parity_vs_numpy_reference_embed():
    """Same u, same key material -> bit-identical latent vs the scalar oracle."""
    cfg = _cfg(message_bits=256)
    key, nonce = cfg.resolve_key_nonce()
    msg = prepare_message_bytes("lthero", 32)
    u = np.random.default_rng(11).uniform(size=(1, 16384)).astype(np.float64)
    golden = reference_embed_numpy(key, nonce, msg, 512, 512, l=1, u=u)
    ours, _ = embed_latents(cfg, message_bytes=msg, u=jnp.asarray(u))
    # fp32 ndtri vs fp64 scipy.norm.ppf: agreement to ~1e-4 absolute; the
    # decode path (sign/quantize level) is bit-exact — see decode parity tests.
    np.testing.assert_allclose(np.asarray(ours)[0], golden, atol=5e-4)
    # and the decoded bits from our latent match the golden decode exactly
    got = reference_decode_numpy(np.asarray(ours)[0], key, nonce, 256)
    assert got == bitops.bits_to_bin_str(
        np.asarray(recover_message_bits(ours, cfg))[0]
    )


def test_parity_vs_numpy_reference_decode():
    cfg = _cfg(message_bits=256)
    key, nonce = cfg.resolve_key_nonce()
    lat = np.random.default_rng(5).normal(size=(4, 64, 64)).astype(np.float32)
    golden = reference_decode_numpy(lat, key, nonce, 256)
    ours = decode_latents(jnp.asarray(lat), cfg)
    assert ours == golden


def test_decode_parity_l2():
    cfg = _cfg(width=256, height=256, message_bits=64, l=2)
    key, nonce = cfg.resolve_key_nonce()
    lat = np.random.default_rng(9).normal(size=(4, 32, 32)).astype(np.float32)
    golden = reference_decode_numpy(lat, key, nonce, 64, l=2)
    ours = decode_latents(jnp.asarray(lat), cfg)
    assert ours == golden


def test_watermarked_latent_is_standard_normal():
    """Distribution-preservation (the paper's lossless property): KS test."""
    cfg = _cfg(message_bits=256)
    lat, _ = embed_latents(cfg, rng=jax.random.key(123))
    sample = np.asarray(lat).ravel()
    stat, pvalue = stats.kstest(sample, "norm")
    assert pvalue > 0.01, (stat, pvalue)
    # and a fresh rng gives a different latent (u is per-call randomness)
    lat2, _ = embed_latents(cfg, rng=jax.random.key(124))
    assert not np.allclose(np.asarray(lat), np.asarray(lat2))


def test_robustness_to_noise_on_latent():
    """Majority vote survives sign flips from moderate latent noise."""
    cfg = _cfg(message_bits=256)
    lat, msg = embed_latents(cfg, rng=jax.random.key(21))
    noisy = lat + 0.6 * jax.random.normal(jax.random.key(22), lat.shape)
    voted = np.asarray(recover_message_bits(noisy, cfg))[0]
    acc = np.mean(voted == bitops.bytes_to_bits(msg))
    assert acc == 1.0  # 64x redundancy absorbs this easily


def test_key_nonce_fallback_rule():
    key, nonce = resolve_key_nonce(KEY_HEX, "")
    assert key == bytes.fromhex(KEY_HEX)
    assert nonce == bytes.fromhex(KEY_HEX[16:48])
    k2, n2 = resolve_key_nonce("", "")
    assert len(k2) == 32 and len(n2) == 16


def test_capacity_table():
    # nodes.py:26-49 semantics on the element count
    assert choose_watermark_length(4 * 64 * 64) == 512   # 512x512
    assert choose_watermark_length(4 * 128 * 128) == 1024  # 1024x1024
    assert choose_watermark_length(4 * 32 * 32) == 128   # 256x256
    assert choose_watermark_length(4 * 8 * 8) == 32      # tiny
    assert GSConfig(width=512, height=512).resolved_message_bits == 512
    assert GSConfig(width=512, height=512, message_bits=256).repeats == 64


def test_majority_tie_goes_to_zero():
    # 2 segments, one 1 and one 0 at each position -> tie -> 0
    payload = jnp.array([[1, 0, 0, 1]], dtype=jnp.uint8)  # segs [1,0],[0,1]
    voted = majority_vote(payload, 2)
    np.testing.assert_array_equal(np.asarray(voted), [[0, 0]])
    # 3 segments: strict majority wins
    payload3 = jnp.array([[1, 0, 1, 0, 1, 1]], dtype=jnp.uint8)
    voted3 = majority_vote(payload3, 2)
    np.testing.assert_array_equal(np.asarray(voted3), [[1, 0]])


def test_message_padding_truncation():
    assert prepare_message_bytes("lthero", 32) == b"lthero" + b"\x00" * 26
    long = "x" * 50
    assert prepare_message_bytes(long, 32) == long.encode()[:32]
    # repeat4 (A1111 use_repeat): 8-byte unit tiled x4
    assert prepare_message_bytes("ab", 32, repeat4=True) == (b"ab" + b"\x00" * 6) * 4


def test_seeded_replication_semantics():
    """ComfyUI: seeded -> one latent replicated; unseeded -> independent
    (nodes.py:232-238)."""
    cfg = _cfg(message_bits=256, seed=42)
    lat, _ = embed_latents(cfg, batch=3)
    assert np.allclose(np.asarray(lat[0]), np.asarray(lat[1]))
    cfg2 = _cfg(message_bits=256)
    lat2, _ = embed_latents(cfg2, rng=jax.random.key(0), batch=3)
    assert not np.allclose(np.asarray(lat2[0]), np.asarray(lat2[1]))


def test_zero_fill_remainder():
    # 96x96 latent (768px): 4*12*12=576 elements, 32-bit msg -> 18 repeats, no
    # remainder; use 160px -> 4*20*20=1600, 64-bit -> 25 repeats exact; force a
    # remainder with message_bits=384 at 512px: 16384//384=42, rem 256 bits.
    cfg = _cfg(width=512, height=512, message_bits=384, message="remtest")
    lat, msg = embed_latents(cfg, rng=jax.random.key(1))
    voted = np.asarray(recover_message_bits(lat, cfg))[0]
    np.testing.assert_array_equal(voted, bitops.bytes_to_bits(msg))
