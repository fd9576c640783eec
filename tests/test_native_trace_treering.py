"""Native library parity, traceability search, Tree-Ring toolkit, and
detection statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gswm import native
from gswm.config import GSConfig
from gswm.core import bits as bitops
from gswm.core.chacha import chacha20_keystream
from gswm.core.embed import embed_latents
from gswm.eval.detection import (
    bit_match_pvalue,
    detection_threshold,
    is_detected,
    tpr_at_fpr,
)
from gswm.eval.trace import find_source


def test_native_builds():
    assert native.available(), "g++ toolchain present; native build must work"


def test_native_chacha_matches_cryptography():
    key = bytes(range(32))
    nonce = bytes(range(100, 116))
    for n in (64, 2048, 2048 + 13):
        assert native.chacha20_keystream(key, nonce, n) == \
            chacha20_keystream(key, nonce, n)


def test_native_decode_matches_core():
    cfg = GSConfig(key_hex="22" * 32, nonce_hex="33" * 16, message="native",
                   message_bits=256)
    lat, msg = embed_latents(cfg, rng=jax.random.key(0))
    qbits = native.quantize_bits(np.asarray(lat)[0], l=1)
    voted = native.decode(qbits, bytes.fromhex(cfg.key_hex),
                          bytes.fromhex(cfg.nonce_hex), 256)
    np.testing.assert_array_equal(voted, bitops.bytes_to_bits(msg))


def test_native_quantize_l2():
    z = np.random.default_rng(0).normal(size=256).astype(np.float32)
    got = native.quantize_bits(z, l=2)
    from scipy.stats import norm

    y = np.clip((norm.cdf(z.astype(np.float64)) * 4).astype(int), 0, 3)
    want = np.zeros(512, dtype=np.uint8)
    want[0::2] = (y >> 1) & 1
    want[1::2] = y & 1
    np.testing.assert_array_equal(got, want)


def test_traceability_search():
    """10 candidate keys, one correct: the search must rank it first with
    ~1.0 accuracy while wrong keys sit at ~0.5."""
    rng = np.random.default_rng(7)
    records = []
    target_idx = 6
    lat = None
    for i in range(10):
        key, nonce = rng.bytes(32), rng.bytes(16)
        msg = rng.bytes(32)
        records.append({"key_hex": key.hex(), "nonce_hex": nonce.hex(),
                        "message_hex": msg.hex(), "message_length": 256})
        if i == target_idx:
            cfg = GSConfig(key_hex=key.hex(), nonce_hex=nonce.hex(),
                           message_bits=256)
            lat_arr, _ = embed_latents(cfg, rng=jax.random.key(3),
                                       message_bytes=msg)
            lat = np.asarray(lat_arr)[0]
    best, best_acc, accs = find_source(lat, records)
    assert best == target_idx
    assert best_acc == 1.0
    others = [a for i, a in enumerate(accs) if i != target_idx]
    assert max(others) < 0.7


def test_traceability_1k_device_matches_native():
    """1000-record registry (BASELINE config-5 scale / 10): the device-
    batched scorer must agree with the native per-candidate loop on every
    score and rank the true record first.  chunk=256 exercises chunking."""
    from gswm.eval.trace import find_source_device

    rng = np.random.default_rng(11)
    records = []
    target_idx = 137
    lat = None
    for i in range(1000):
        key, nonce, msg = rng.bytes(32), rng.bytes(16), rng.bytes(32)
        records.append({"key_hex": key.hex(), "nonce_hex": nonce.hex(),
                        "message_hex": msg.hex(), "message_length": 256})
        if i == target_idx:
            cfg = GSConfig(key_hex=key.hex(), nonce_hex=nonce.hex(),
                           message_bits=256)
            lat_arr, _ = embed_latents(cfg, rng=jax.random.key(5),
                                       message_bytes=msg)
            lat = np.asarray(lat_arr)[0]

    best_n, acc_n, accs_n = find_source(lat, records)
    best_d, acc_d, accs_d = find_source_device(lat, records, chunk=256)
    assert best_n == best_d == target_idx
    assert acc_n == acc_d == 1.0
    np.testing.assert_allclose(accs_n, accs_d, atol=1e-6)


def test_detection_statistics():
    assert bit_match_pvalue(256, 256) < 1e-70
    assert 0.4 < bit_match_pvalue(129, 256) < 0.6
    th = detection_threshold(256, fpr=1e-6)
    assert 190 > th > 150
    assert is_detected(0.9, 256, fpr=1e-6)
    assert not is_detected(0.55, 256, fpr=1e-6)
    assert tpr_at_fpr([0.9, 0.95, 0.5], 256) == pytest.approx(2 / 3)


def test_treering_inject_detect():
    from gswm.treering import (
        eval_watermark,
        get_p_value,
        get_watermarking_mask,
        get_watermarking_pattern,
        inject_watermark,
    )

    shape = (2, 4, 64, 64)
    lat = jax.random.normal(jax.random.key(0), shape)
    mask = get_watermarking_mask(shape, w_channel=0, w_radius=10)
    pattern = get_watermarking_pattern(jax.random.key(1), shape, "ring", 10)

    wm = inject_watermark(lat, mask, pattern)
    assert wm.shape == shape and wm.dtype == jnp.float32

    d_wm = eval_watermark(wm, pattern, mask)
    d_clean = eval_watermark(lat, pattern, mask)
    assert float(d_wm.mean()) < float(d_clean.mean()) * 0.5

    p_wm = get_p_value(wm, pattern, mask)
    p_clean = get_p_value(lat, pattern, mask)
    assert max(p_wm) < min(p_clean)


def test_treering_mask_shapes():
    from gswm.treering import get_watermarking_mask

    shape = (1, 4, 32, 32)
    circle = get_watermarking_mask(shape, 0, 8, "circle")
    assert bool(circle[0, 0, 16, 16]) and not bool(circle[0, 1, 16, 16])
    allch = get_watermarking_mask(shape, -1, 8, "circle")
    assert bool(allch[0, 3, 16, 16])
    square = get_watermarking_mask(shape, 0, 4, "square")
    assert int(square[0, 0].sum()) == 64
    none = get_watermarking_mask(shape, 0, 4, "no")
    assert int(none.sum()) == 0
