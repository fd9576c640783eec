"""Pair-packed flash attention parity (gswm.ops.attention round 3).

flash_attention_packed runs two d=64 heads per 128-lane grid block over the
natural (B, S, H*64) projection layout — no reshape/transpose/split in the
XLA graph (the lvl0 relayout copies, docs/BENCH.md round-3 budget).  These
tests pin its numerics against reference_attention in interpret mode,
including the odd-head-count case where the projection weights are
zero-padded and the pad half must contribute exactly zero.
Reference semantics: diffusers Attention via /root/reference extract.py:46-70.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gswm.ops.attention import (
    flash_attention_packed,
    packed_attention_fits,
    reference_attention,
)


def _pack_qkv(q, k, v, pairs):
    """(B,S,H,64) each -> (B, S, 3*pairs*128) in the packed lane layout."""
    b, s, h, d = q.shape

    def flat_pad(t):
        t = t.reshape(b, s, h * d)
        pad = pairs * 128 - h * d
        return jnp.pad(t, ((0, 0), (0, 0), (0, pad))) if pad else t

    return jnp.concatenate([flat_pad(q), flat_pad(k), flat_pad(v)], axis=-1)


@pytest.mark.parametrize("b,s,h", [
    (2, 256, 2),    # even heads: packed layout == natural layout
    (1, 256, 3),    # odd heads: zero-padded pair half
    (1, 300, 2),    # ragged sequence: padded keys masked, rows sliced
    (1, 512, 5),    # the SD lvl0 head count
])
def test_matches_reference(b, s, h):
    d = 64
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (b, s, h, d))
    k = jax.random.normal(kk, (b, s, h, d))
    v = jax.random.normal(kv, (b, s, h, d))
    pairs = -(-h // 2)
    got = flash_attention_packed(_pack_qkv(q, k, v, pairs), d, interpret=True)
    want = reference_attention(q, k, v).reshape(b, s, h * d)
    np.testing.assert_allclose(np.asarray(got[:, :, : h * d]),
                               np.asarray(want), atol=2e-5)
    # the zero-padded head half must be exactly zero (to_out's zero rows
    # rely on it never being NaN/garbage)
    if pairs * 128 != h * d:
        np.testing.assert_array_equal(np.asarray(got[:, :, h * d:]), 0.0)


@pytest.mark.parametrize("b,s,h", [
    (2, 768, 2),    # even heads
    (1, 768, 5),    # odd heads: zero-padded pair half
    (1, 400, 3),    # ragged sequence: padded keys masked, rows sliced
])
def test_streamk_tier_matches_reference(b, s, h, monkeypatch):
    """The pair streaming-K tier (sequential k-tile grid dim, persistent
    m/l/acc scratch split per 64-lane half) matches reference numerics;
    it is the any-length fallthrough used at SDXL's 16384 tokens."""
    monkeypatch.setenv("GSWM_PACKED_TIER", "streamk")
    flash_attention_packed._clear_cache()
    d = 64
    kq, kk, kv = jax.random.split(jax.random.key(6), 3)
    q = jax.random.normal(kq, (b, s, h, d))
    k = jax.random.normal(kk, (b, s, h, d))
    v = jax.random.normal(kv, (b, s, h, d))
    pairs = -(-h // 2)
    got = flash_attention_packed(_pack_qkv(q, k, v, pairs), d, interpret=True)
    want = reference_attention(q, k, v).reshape(b, s, h * d)
    np.testing.assert_allclose(np.asarray(got[:, :, : h * d]),
                               np.asarray(want), atol=2e-5)
    if pairs * 128 != h * d:
        np.testing.assert_array_equal(np.asarray(got[:, :, h * d:]), 0.0)
    # bf16 nomax path through the same tier
    got_bf = flash_attention_packed(
        _pack_qkv(q, k, v, pairs).astype(jnp.bfloat16), d, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_bf[:, :, : h * d], np.float32), np.asarray(want),
        atol=0.08)
    flash_attention_packed._clear_cache()


def test_bf16_nomax_close_to_fp32():
    b, s, h, d = 1, 256, 2, 64
    kq, kk, kv = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(kq, (b, s, h, d))
    k = jax.random.normal(kk, (b, s, h, d))
    v = jax.random.normal(kv, (b, s, h, d))
    qkv = _pack_qkv(q, k, v, 1)
    f32 = flash_attention_packed(qkv, d, interpret=True)
    bf = flash_attention_packed(qkv.astype(jnp.bfloat16), d, interpret=True)
    assert bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(bf, np.float32), np.asarray(f32),
                               atol=0.06)


def test_fits_policy():
    assert packed_attention_fits(4096)          # SD lvl0 at 512x512: resident
    assert packed_attention_fits(9216)          # 768-class lvl0: kvres tier
    assert not packed_attention_fits(16384)     # SDXL lvl0: split path


@pytest.mark.parametrize("b,s,h", [
    (2, 640, 2),    # even heads
    (1, 640, 5),    # odd heads: zero-padded pair half
    (1, 330, 3),    # ragged sequence: padded keys masked, rows sliced
])
def test_kvres_tier_matches_reference(b, s, h, monkeypatch):
    """The pair KV-resident tier (q-streamed grid) matches reference
    numerics; it is the layout used at 768-class 9216-token shapes where
    the pair-resident blocks exceed VMEM.  The forced tier is read at trace
    time, so the jit cache is cleared around the force (shapes here are
    also distinct from the resident-tier tests)."""
    monkeypatch.setenv("GSWM_PACKED_TIER", "kvres")
    flash_attention_packed._clear_cache()
    d = 64
    kq, kk, kv = jax.random.split(jax.random.key(4), 3)
    q = jax.random.normal(kq, (b, s, h, d))
    k = jax.random.normal(kk, (b, s, h, d))
    v = jax.random.normal(kv, (b, s, h, d))
    pairs = -(-h // 2)
    got = flash_attention_packed(_pack_qkv(q, k, v, pairs), d, interpret=True)
    want = reference_attention(q, k, v).reshape(b, s, h * d)
    np.testing.assert_allclose(np.asarray(got[:, :, : h * d]),
                               np.asarray(want), atol=2e-5)
    if pairs * 128 != h * d:
        np.testing.assert_array_equal(np.asarray(got[:, :, h * d:]), 0.0)


def test_layer_routes_packed(monkeypatch):
    """The Attention layer produces identical outputs with the packed path
    forced on vs off (einsum), in interpret mode."""
    from gswm.models.layers import Attention

    monkeypatch.setenv("GSWM_FORCE_FLASH", "1")
    monkeypatch.setenv("GSWM_PACKED_ATTN", "1")
    monkeypatch.setenv("GSWM_PACKED_ATTN_MIN_SEQ", "256")
    b, s, c, h, d = 1, 256, 96, 3, 64
    x = jax.random.normal(jax.random.key(2), (b, s, c))
    mod = Attention(heads=h, head_dim=d, dtype=jnp.float32)
    params = mod.init(jax.random.key(3), x)
    assert mod.bind(params)._use_packed(x)
    got = mod.apply(params, x)
    monkeypatch.delenv("GSWM_PACKED_ATTN")
    monkeypatch.setenv("GSWM_FLASH_MIN_SEQ", "99999")  # einsum reference
    want = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
