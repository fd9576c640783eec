"""Flash attention kernel vs reference attention (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gswm.ops.attention import flash_attention, reference_attention


@pytest.mark.parametrize(
    "b,s,h,d,sk",
    [
        (1, 256, 2, 64, 256),     # self-attn, exact block fit
        (2, 300, 2, 64, 300),     # padded q and k
        (1, 512, 4, 64, 77),      # cross-attn (CLIP context length)
    ],
)
def test_flash_matches_reference(b, s, h, d, sk):
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, sk, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, sk, h, d), jnp.float32)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_streaming_k_layout_matches(monkeypatch):
    """Force the long-sequence streaming-K path and check parity."""
    import gswm.ops.attention as A

    monkeypatch.setattr(A, "_RESIDENT_VMEM_BUDGET", 0)
    monkeypatch.setattr(A, "_KVRES_VMEM_BUDGET", 0)
    kq, kk, kv = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(kq, (1, 384, 2, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 520, 2, 64), jnp.float32)  # padded tail
    v = jax.random.normal(kv, (1, 520, 2, 64), jnp.float32)
    got = A.flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_kv_resident_layout_matches(monkeypatch):
    """Force the KV-resident / Q-streamed middle tier (the 768x768 and SDXL
    16k-token layout) and check parity, including a padded key tail."""
    import gswm.ops.attention as A

    monkeypatch.setattr(A, "_RESIDENT_VMEM_BUDGET", 0)
    kq, kk, kv = jax.random.split(jax.random.key(4), 3)
    q = jax.random.normal(kq, (1, 384, 2, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 520, 2, 64), jnp.float32)
    v = jax.random.normal(kv, (1, 520, 2, 64), jnp.float32)
    got = A.flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_kv_resident_bf16(monkeypatch):
    import gswm.ops.attention as A

    monkeypatch.setattr(A, "_RESIDENT_VMEM_BUDGET", 0)
    kq, kk, kv = jax.random.split(jax.random.key(5), 3)
    q = jax.random.normal(kq, (1, 512, 2, 64), jnp.bfloat16)
    k = jax.random.normal(kk, (1, 512, 2, 64), jnp.bfloat16)
    v = jax.random.normal(kv, (1, 512, 2, 64), jnp.bfloat16)
    got = A.flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    want = reference_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                               v.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want), atol=0.06
    )


def test_single_head_wide_dim_matches_reference():
    """VAE mid-block shape: one head, d = C = 512 (streamk tier at this
    size) — the layout the VAEAttention flash route uses."""
    kq, kk, kv = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(kq, (1, 1024, 1, 512), jnp.float32)
    k = jax.random.normal(kk, (1, 1024, 1, 512), jnp.float32)
    v = jax.random.normal(kv, (1, 1024, 1, 512), jnp.float32)
    got = flash_attention(q, k, v, block_q=256, block_k=256, interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_vae_attention_flash_route_matches_einsum(monkeypatch):
    """VAEAttention's flash route (hw >= 1024, single head d=C) must equal
    its einsum path."""
    import gswm.models.layers as L

    va = L.VAEAttention(dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(8), (1, 32, 32, 64), jnp.float32)
    params = va.init(jax.random.key(9), x)
    base = va.apply(params, x)
    monkeypatch.setenv("GSWM_FORCE_FLASH", "1")
    monkeypatch.setattr(L, "_VAE_FLASH_MIN_TOKENS", 512)
    flash = va.apply(params, x)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(base),
                               atol=3e-5, rtol=3e-5)


def test_small_key_set_matches_reference():
    """Cross-attention fast path (sk < 512 -> einsum; blockwise kernels
    measured 10x slower there, see attention.py) with an unaligned 77-token
    key set, bf16 and fp32."""
    kq, kk, kv = jax.random.split(jax.random.key(6), 3)
    for dtype, atol in ((jnp.float32, 2e-5), (jnp.bfloat16, 0.06)):
        q = jax.random.normal(kq, (2, 300, 2, 64), dtype)
        k = jax.random.normal(kk, (2, 77, 2, 64), dtype)
        v = jax.random.normal(kv, (2, 77, 2, 64), dtype)
        got = flash_attention(q, k, v, interpret=True)
        want = reference_attention(q.astype(jnp.float32),
                                   k.astype(jnp.float32),
                                   v.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), atol=atol)


def test_flash_bf16():
    kq, kk, kv = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(kq, (1, 256, 2, 64), jnp.bfloat16)
    k = jax.random.normal(kk, (1, 256, 2, 64), jnp.bfloat16)
    v = jax.random.normal(kv, (1, 256, 2, 64), jnp.bfloat16)
    got = flash_attention(q, k, v, interpret=True)
    want = reference_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                               v.astype(jnp.float32))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want), atol=0.06
    )
