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
    kq, kk, kv = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(kq, (1, 384, 2, 64), jnp.float32)
    k = jax.random.normal(kk, (1, 520, 2, 64), jnp.float32)  # padded tail
    v = jax.random.normal(kv, (1, 520, 2, 64), jnp.float32)
    got = A.flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


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
