"""Plain-XLA flash attention parity (gswm.ops.attention round 5).

xla_flash_attention has NO kernel code — it is the qkT -> clamp/exp -> PV
dot chain with the softmax row-sum riding the PV dot as a ones-column,
relying on XLA's windowed fusion emitter for the flash scheduling (the
round-5 attribution: docs/BENCH.md, tools/exp_xla_flash.py — 37.30 vs the
Mosaic cres kernel's 43.57 ms at SD lvl0).  Being plain jnp it runs
identically on CPU, so parity needs no interpret mode.  Reference
semantics: diffusers Attention, /root/reference extract.py:46-70.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gswm.ops.attention import reference_attention, xla_flash_attention


def _make(b, s, h, d, key=0, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(jax.random.key(key), 3)
    q = jax.random.normal(kq, (b, s, h * d), dtype)
    k = jax.random.normal(kk, (b, s, h * d), dtype)
    v = jax.random.normal(kv, (b, s, h * d), dtype)
    return q, k, v


@pytest.mark.parametrize("b,s,h,d", [
    (2, 256, 2, 32),
    (1, 300, 2, 32),      # ragged seq — no padding exists, plain shapes
    (1, 513, 3, 64),      # odd length, not a power of two
    (2, 1024, 5, 64),     # SD lvl0 head structure at reduced seq
    (1, 640, 10, 64),     # SDXL lvl1 head count
])
def test_matches_reference(b, s, h, d):
    q, k, v = _make(b, s, h, d)
    got = xla_flash_attention(q, k, v, h, d)
    want = reference_attention(
        q.reshape(b, s, h, d), k.reshape(b, s, h, d), v.reshape(b, s, h, d)
    ).reshape(b, s, h * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bf16_path_close_to_fp32():
    b, s, h, d = 1, 384, 2, 64
    q, k, v = _make(b, s, h, d, key=1)
    f32 = xla_flash_attention(q, k, v, h, d)
    bf = xla_flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                             v.astype(jnp.bfloat16), h, d)
    np.testing.assert_allclose(np.asarray(bf).astype(np.float32),
                               np.asarray(f32), atol=4e-2)


def test_matches_cres_kernel_semantics():
    """Same inputs through the Pallas cres tier (interpret) and the XLA
    formulation — the two default tiers must agree, not just each match
    the fp32 oracle."""
    from gswm.ops.attention import flash_attention_cres

    b, s, h, d, c_kv = 2, 512, 3, 64, 256
    q, k, v = _make(b, s, h, d, key=2)
    pad = c_kv - h * d
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
    want = flash_attention_cres(q, kp, vp, h, d, interpret=True)
    got = xla_flash_attention(q, k, v, h, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_routing_prefers_xf(monkeypatch):
    """Above the fused-qkv window the Attention layer routes to
    xla_flash_attention by default (GSWM_XF_ATTN=0 restores Pallas)."""
    from gswm.models.layers import Attention

    calls = []
    import gswm.ops.attention as A

    real = A.xla_flash_attention

    def spy(q, k, v, heads, head_dim):
        calls.append(q.shape)
        return real(q, k, v, heads, head_dim)

    monkeypatch.setattr(A, "xla_flash_attention", spy)
    monkeypatch.setenv("GSWM_FORCE_FLASH", "1")
    monkeypatch.setenv("GSWM_XF_ATTN_MIN_SEQ", "256")

    attn = Attention(heads=2, head_dim=32, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (1, 256, 64))
    params = attn.init(jax.random.key(1), x)
    out = attn.apply(params, x)
    assert calls and calls[0] == (1, 256, 64)
    assert out.shape == (1, 256, 64)

    calls.clear()
    monkeypatch.setenv("GSWM_XF_ATTN", "0")
    attn.apply(params, x)
    assert not calls


def test_bf16_exp_knob(monkeypatch):
    """GSWM_XF_BF16_EXP=1 (the r5c wholeb experiment as a trace-time knob,
    default OFF): bf16 logits before the exp.  O(1%) relative error vs the
    fp32-exp formulation — close, sign-preserving on the output, and OFF
    means bit-identical to the default path."""
    b, s, h, d = 1, 320, 2, 64
    q, k, v = _make(b, s, h, d, key=2)  # fp32: the default path keeps p fp32

    base = jax.jit(xla_flash_attention, static_argnums=(3, 4))(q, k, v, h, d)
    monkeypatch.setenv("GSWM_XF_BF16_EXP", "1")
    # fresh trace: the knob is read at trace time
    # fresh function identity: jit's trace cache is shared across wrapper
    # instances of the same function, so a plain re-jit would reuse the
    # knob-off jaxpr
    lowered = jax.jit(
        lambda q, k, v: xla_flash_attention(q, k, v, h, d)).lower(q, k, v)
    assert "bf16" in lowered.as_text()  # the knob actually changed the trace
    wb = lowered.compile()(q, k, v)
    a = np.asarray(base)
    bw = np.asarray(wb)
    np.testing.assert_allclose(bw, a, atol=6e-2)
    # relative error stays O(1%) where the output is not tiny
    mask = np.abs(a) > 0.1
    rel = np.abs(bw[mask] - a[mask]) / np.abs(a[mask])
    assert float(np.median(rel)) < 0.02
