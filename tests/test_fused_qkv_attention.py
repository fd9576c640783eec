"""Fused-qkv flash attention parity (gswm.ops.attention round 3).

The fused kernel moves the q/k/v projections INSIDE the pallas kernel to
kill the matmul->split->to_bhsd relayout copies around the split path
(measured ~2.5 s of a 35 s extraction pass, docs/BENCH.md round 3).  These
tests pin its numerics against the projection + reference-attention math
and against the Attention module's einsum path in interpret mode, so CI
catches drift off-TPU.  Reference semantics: diffusers Attention (bias-free
q/k/v projections), /root/reference's pipelines via extract.py:46-70.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gswm.ops.attention import (
    flash_attention_fused_qkv,
    fused_qkv_attention_fits,
    reference_attention,
)


@pytest.mark.parametrize("b,s,c,h,d", [
    (2, 256, 64, 2, 32),
    (1, 300, 64, 2, 32),    # ragged: padded rows sliced, padded keys masked
    (1, 512, 128, 4, 32),
    # s_pad NOT a multiple of the 512-row x-DMA chunk: regression for the
    # unprojected-tail-K/V bug (rows past the last full chunk were garbage
    # inside valid_k; 768x768 lvl1's 2304 tokens is the shipped shape)
    (1, 640, 96, 3, 64),
    (1, 2304, 128, 2, 64),
])
def test_matches_projection_plus_reference(b, s, c, h, d):
    kx, kq, kk, kv = jax.random.split(jax.random.key(0), 4)
    x = jax.random.normal(kx, (b, s, c))
    wq = jax.random.normal(kq, (c, h * d)) * 0.1
    wk = jax.random.normal(kk, (c, h * d)) * 0.1
    wv = jax.random.normal(kv, (c, h * d)) * 0.1
    got = flash_attention_fused_qkv(x, wq, wk, wv, h, d, interpret=True)
    want = reference_attention(
        (x @ wq).reshape(b, s, h, d),
        (x @ wk).reshape(b, s, h, d),
        (x @ wv).reshape(b, s, h, d),
    ).reshape(b, s, h * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bf16_path_close_to_fp32():
    b, s, c, h, d = 1, 256, 64, 2, 32
    kx, kw = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (b, s, c))
    w = jax.random.normal(kw, (c, 3 * h * d)) * 0.1
    wq, wk, wv = jnp.split(w, 3, axis=1)
    f32 = flash_attention_fused_qkv(x, wq, wk, wv, h, d, interpret=True)
    bf = flash_attention_fused_qkv(
        x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
        wk.astype(jnp.bfloat16), wv.astype(jnp.bfloat16), h, d,
        interpret=True)
    assert bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(bf, np.float32), np.asarray(f32),
                               atol=0.06)


def test_module_routes_and_matches(monkeypatch):
    """Attention module: fused path forced on (GSWM_FORCE_FLASH) matches the
    einsum path, same param tree."""
    from gswm.models.layers import Attention

    b, s, c, h, d = 1, 256, 64, 2, 32
    x = jax.random.normal(jax.random.key(2), (b, s, c))
    mod = Attention(heads=h, head_dim=d)
    params = mod.init(jax.random.key(3), x)

    monkeypatch.delenv("GSWM_FORCE_FLASH", raising=False)
    want = mod.apply(params, x)
    monkeypatch.setenv("GSWM_FORCE_FLASH", "1")
    assert mod._use_fused_qkv(x)
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    monkeypatch.setenv("GSWM_FUSED_QKV", "0")
    assert not mod._use_fused_qkv(x)


def test_routing_window():
    from gswm.models.layers import Attention

    mod = Attention(heads=5, head_dim=64)
    # 4096 tokens: measured LOSS for the fused kernel -> split path
    assert not mod._use_fused_qkv(jnp.zeros((1, 4096, 320)))
    # cross-attention sequences below 256 stay on einsum
    assert not mod._use_fused_qkv(jnp.zeros((1, 77, 320)))
    assert fused_qkv_attention_fits(1024, 640, 640)
    assert not fused_qkv_attention_fits(16384, 640, 640)


def test_fused_qkv_under_tp_mesh_falls_back():
    """Under a tp>1 mesh the module must keep the shard_map'able split path
    (the fused kernel cannot be head-sharded by GSPMD)."""
    from gswm.models.layers import Attention

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = jax.sharding.Mesh(np.array(devs[:2]).reshape(2), ("tp",))
    mod = Attention(heads=2, head_dim=32)
    x = jnp.zeros((1, 256, 64))
    with jax.set_mesh(mesh):
        assert not mod._use_fused_qkv(x)
    assert mod._use_fused_qkv(x) or os.environ.get("GSWM_FUSED_QKV") == "0"
