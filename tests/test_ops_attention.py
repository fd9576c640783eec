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


def test_exp_fast_accuracy():
    """The polynomial exp2 must stay well under the bf16 ulp (3.9e-3) over
    the full online-softmax input range [-80, 0], incl. the -inf init of the
    running max and the -1e30 masking sentinel."""
    from gswm.ops.attention import _exp_fast

    x = -jnp.linspace(0.0, 80.0, 100001, dtype=jnp.float32)
    got = np.asarray(_exp_fast(x), np.float64)
    want = np.exp(np.asarray(x, np.float64))
    rel = np.abs(got / want - 1.0)
    assert rel.max() < 3e-4, rel.max()
    assert float(_exp_fast(jnp.float32(-jnp.inf))) == pytest.approx(0.0, abs=1e-30)
    assert float(_exp_fast(jnp.float32(-1e30))) == pytest.approx(0.0, abs=1e-30)
    assert float(_exp_fast(jnp.float32(0.0))) == pytest.approx(1.0, rel=3e-4)


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
