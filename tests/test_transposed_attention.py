"""Transposed-operand flash attention parity (gswm.ops.attention round 3).

flash_attention_transposed consumes the (3*H*D, B, S) output a
``('nc,bsc->nbs')`` qkv projection produces natively and emits (H*D, B, S)
for to_out to consume in place — the third (and layout-free) attack on the
lvl0 relayout copies (docs/BENCH.md round-3 budget).  These tests pin its
numerics against reference_attention in interpret mode: the in-kernel math
runs entirely in transposed space (scores via a d-contraction, row sums via
an MXU ones-matvec, the accumulator as (d, bq)) and must still reproduce
plain softmax attention exactly.
Reference semantics: diffusers Attention via /root/reference extract.py:46-70.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gswm.ops.attention import (
    flash_attention_transposed,
    reference_attention,
    transposed_attention_fits,
)


def _to_T(q, k, v):
    """(B,S,H,D) each -> (3*H*D, B, S) head-major stacked transpose."""
    b, s, h, d = q.shape

    def t(x):
        return jnp.transpose(x, (2, 3, 0, 1)).reshape(h * d, b, s)

    return jnp.concatenate([t(q), t(k), t(v)], axis=0)


def _from_T(oT, h, d):
    inner, b, s = oT.shape
    return jnp.transpose(oT.reshape(h, d, b, s), (2, 3, 0, 1))


@pytest.mark.parametrize("b,s,h,d", [
    (2, 256, 2, 64),    # one q tile, one k block
    (1, 640, 3, 64),    # ragged sequence: padded keys masked, rows sliced
    (2, 1024, 5, 64),   # the SD lvl0 head count, multiple q tiles
    (1, 512, 2, 32),    # non-64 head_dim
])
def test_matches_reference(b, s, h, d):
    kq, kk, kv = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(kq, (b, s, h, d))
    k = jax.random.normal(kk, (b, s, h, d))
    v = jax.random.normal(kv, (b, s, h, d))
    oT = flash_attention_transposed(_to_T(q, k, v), h, d, interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(_from_T(oT, h, d)),
                               np.asarray(want), atol=2e-5)


def test_matches_reference_bf16():
    b, s, h, d = 1, 512, 2, 64
    kq, kk, kv = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
    oT = flash_attention_transposed(_to_T(q, k, v), h, d, interpret=True)
    want = reference_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                               v.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(_from_T(oT, h, d)).astype(np.float32),
        np.asarray(want), atol=2e-2)


def test_block_boundary_shapes():
    # s not a multiple of block_q: the padded q rows are sliced off and the
    # padded keys masked (the fused-qkv DMA-chunk class of bug)
    b, s, h, d = 1, 2304, 2, 64
    kq, kk, kv = jax.random.split(jax.random.key(11), 3)
    q = jax.random.normal(kq, (b, s, h, d))
    k = jax.random.normal(kk, (b, s, h, d))
    v = jax.random.normal(kv, (b, s, h, d))
    oT = flash_attention_transposed(_to_T(q, k, v), h, d, interpret=True)
    assert oT.shape == (h * d, b, s)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(_from_T(oT, h, d)),
                               np.asarray(want), atol=2e-5)


def test_layer_routes_transposed(monkeypatch):
    """The Attention layer produces identical outputs with the transposed
    path forced on vs off (einsum), in interpret mode."""
    import jax.numpy as jnp
    from gswm.models.layers import Attention

    monkeypatch.setenv("GSWM_FORCE_FLASH", "1")
    monkeypatch.setenv("GSWM_TRANSPOSED_ATTN", "1")
    monkeypatch.setenv("GSWM_TRANSPOSED_ATTN_MIN_SEQ", "256")
    b, s, c, h, d = 8, 256, 96, 3, 64
    x = jax.random.normal(jax.random.key(2), (b, s, c))
    mod = Attention(heads=h, head_dim=d, dtype=jnp.float32)
    params = mod.init(jax.random.key(3), x)
    assert mod.bind(params)._use_transposed(x)
    got = mod.apply(params, x)
    monkeypatch.delenv("GSWM_TRANSPOSED_ATTN")
    monkeypatch.setenv("GSWM_FLASH_MIN_SEQ", "99999")  # einsum reference
    want = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fits_policy():
    assert transposed_attention_fits(4096)          # SD lvl0
    assert transposed_attention_fits(16384)         # streaming: any length
    assert not transposed_attention_fits(4096, batch=5)  # 8-sublane DMA gate
