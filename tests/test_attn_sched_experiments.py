"""Parity for the env-gated kernel-rate experiments (round 4):

- GSWM_ATTN_EXP2: base-2 online softmax — log2(e) folded into the Q scale,
  native exp2 in the kernels (drops exp's internal per-logit ln2 multiply).
- GSWM_ATTN_PV_CHUNKS: the no-max body's exp+PV tail split into column
  chunks so VPU exp can overlap the MXU PV matmul of the previous chunk.

Both must be numerically interchangeable with the default path: exp2 mode
is an exact reparametrization up to fp rounding; PV chunking reassociates
the l/acc sums only.  Env is read at TRACE time, so each test clears the
module-level jit caches around the toggle (the production contract is
"set before the first attention call in a process").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gswm.ops.attention as A
from gswm.ops.attention import reference_attention


@pytest.fixture(autouse=True)
def _fresh_jit_caches():
    A._flash_bhsd.clear_cache()
    A.flash_attention_cres.clear_cache()
    yield
    A._flash_bhsd.clear_cache()
    A.flash_attention_cres.clear_cache()


def _qkv(seed, b, s, h, d, sk=None, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(jax.random.key(seed), 3)
    sk = s if sk is None else sk
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, sk, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, sk, h, d), jnp.float32)
    return q.astype(dtype), k.astype(dtype), v.astype(dtype)


def test_exp2_fp32_max_path(monkeypatch):
    """fp32 inputs keep the exact running-max recurrence; in base 2 the
    rescale chain runs as exp2(m - m_new) — parity must hold tightly."""
    monkeypatch.setenv("GSWM_ATTN_EXP2", "1")
    q, k, v = _qkv(10, 1, 320, 2, 64)
    got = A.flash_attention(q, k, v, block_q=128, block_k=128,
                            interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_exp2_bf16_nomax_path(monkeypatch):
    monkeypatch.setenv("GSWM_ATTN_EXP2", "1")
    q, k, v = _qkv(11, 2, 448, 2, 64, dtype=jnp.bfloat16)
    got = A.flash_attention(q, k, v, block_q=128, block_k=128,
                            interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("chunks", [2, 4])
def test_pv_chunks_nomax(monkeypatch, chunks):
    """Chunked exp+PV reassociates the l/acc accumulation only; includes a
    padded key tail so the pre-chunk mask interacts with the split."""
    monkeypatch.setenv("GSWM_ATTN_PV_CHUNKS", str(chunks))
    q, k, v = _qkv(12, 1, 384, 2, 64, sk=328, dtype=jnp.bfloat16)
    got = A.flash_attention(q, k, v, block_q=128, block_k=128,
                            interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


def test_pv_chunks_nondivisor_falls_back(monkeypatch):
    """A chunk count that does not divide block_k must silently run the
    monolithic body, not crash."""
    monkeypatch.setenv("GSWM_ATTN_PV_CHUNKS", "3")
    q, k, v = _qkv(13, 1, 256, 2, 64, dtype=jnp.bfloat16)
    got = A.flash_attention(q, k, v, block_q=128, block_k=128,
                            interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


def test_exp2_pv_chunks_cres(monkeypatch):
    """Combined mode through the channel-resident kernel (the lvl0 512^2
    production tier the experiments target)."""
    monkeypatch.setenv("GSWM_ATTN_EXP2", "1")
    monkeypatch.setenv("GSWM_ATTN_PV_CHUNKS", "2")
    h, d = 2, 64
    inner = h * d
    kq, kk, kv = jax.random.split(jax.random.key(14), 3)
    q = jax.random.normal(kq, (1, 512, inner), jnp.float32)
    k = jax.random.normal(kk, (1, 512, inner), jnp.float32)
    v = jax.random.normal(kv, (1, 512, inner), jnp.float32)
    got = A.flash_attention_cres(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), h, d, block_q=256, block_k=256,
        interpret=True)
    want = reference_attention(
        q.reshape(1, 512, h, d), k.reshape(1, 512, h, d),
        v.reshape(1, 512, h, d)).reshape(1, 512, inner)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2)


def test_exp2_streamk_tier(monkeypatch):
    """Forced streaming-K tier (scratch-accumulator kernel) under base 2,
    fp32 running-max path with a padded key tail."""
    monkeypatch.setenv("GSWM_ATTN_EXP2", "1")
    monkeypatch.setattr(A, "_RESIDENT_VMEM_BUDGET", 0)
    monkeypatch.setattr(A, "_KVRES_VMEM_BUDGET", 0)
    q, k, v = _qkv(15, 1, 384, 2, 64, sk=520)
    got = A.flash_attention(q, k, v, block_q=128, block_k=128,
                            interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)
