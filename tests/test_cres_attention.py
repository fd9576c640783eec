"""Channel-resident flash attention parity (gswm.ops.attention round 4).

The cres tier consumes q/k/v in their NATIVE (B, S, C) projection layout —
q via blockspec, K/V via one manual DMA per image into single-buffered VMEM
scratch — with heads unrolled in-kernel on static 64-lane slices, killing
the (B,S,H,64)->(BH,S,64) relayout copies around the split path (~2.9 s of
a 32 s 512^2 extraction pass, docs/BENCH.md round-3 budget).  These tests
pin its numerics against the reference attention math in interpret mode,
INCLUDING ragged shapes (the round-3 fused-qkv tail bug's lesson: kernel
enablement ships with ragged-shape parity in the same commit).  Reference
semantics: diffusers Attention, /root/reference extract.py:46-70.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gswm.ops.attention import (
    cres_attention_fits,
    flash_attention_cres,
    reference_attention,
)


def _make(b, s, h, d, c_kv, key=0, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(jax.random.key(key), 3)
    q = jax.random.normal(kq, (b, s, h * d), dtype)
    k = jax.random.normal(kk, (b, s, h * d), dtype)
    v = jax.random.normal(kv, (b, s, h * d), dtype)
    pad = c_kv - h * d
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
    return q, k, v, kp, vp


@pytest.mark.parametrize("b,s,h,d,c_kv", [
    (2, 256, 2, 32, 128),
    (1, 300, 2, 32, 128),     # ragged seq: padded rows sliced, keys masked
    (1, 512, 3, 64, 256),     # inner=192 < c_kv=256 (the SD-320->384 case)
    (1, 640, 3, 64, 256),     # ragged: s_pad=640, not a block_k multiple
    (2, 1024, 5, 64, 384),    # SD lvl0 channel structure at reduced seq
])
def test_matches_reference(b, s, h, d, c_kv):
    q, k, v, kp, vp = _make(b, s, h, d, c_kv)
    got = flash_attention_cres(q, kp, vp, h, d, interpret=True)
    want = reference_attention(
        q.reshape(b, s, h, d), k.reshape(b, s, h, d), v.reshape(b, s, h, d)
    ).reshape(b, s, h * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bf16_path_close_to_fp32():
    b, s, h, d, c_kv = 1, 384, 2, 64, 128
    q, k, v, kp, vp = _make(b, s, h, d, c_kv, key=1)
    f32 = flash_attention_cres(q, kp, vp, h, d, interpret=True)
    bf = flash_attention_cres(
        q.astype(jnp.bfloat16), kp.astype(jnp.bfloat16),
        vp.astype(jnp.bfloat16), h, d, interpret=True)
    np.testing.assert_allclose(np.asarray(bf).astype(np.float32),
                               np.asarray(f32), atol=2e-2)


def test_explicit_blocks_match_default():
    """Block-size choice must not change results (the chip A/B sweeps it)."""
    b, s, h, d, c_kv = 1, 512, 2, 64, 128
    q, k, v, kp, vp = _make(b, s, h, d, c_kv, key=2)
    default = flash_attention_cres(q, kp, vp, h, d, interpret=True)
    small = flash_attention_cres(q, kp, vp, h, d, block_q=128, block_k=256,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(small), np.asarray(default),
                               atol=2e-5)


def test_unaligned_ckv_rejected():
    q, k, v, _, _ = _make(1, 256, 5, 64, 384)
    with pytest.raises(ValueError, match="128 multiple"):
        flash_attention_cres(q, k, v, 5, 64, interpret=True)


def test_fits_policy():
    # SD lvl0 at 512^2: 4096 tokens, inner 320 -> fits
    assert cres_attention_fits(4096, 320)
    # SDXL lvl0-equivalent: 4096 tokens, inner 640 -> fits
    assert cres_attention_fits(4096, 640)
    # 768^2 lvl0: 9216 tokens -> K/V scratch alone exceeds VMEM
    assert not cres_attention_fits(9216, 320)
    # SDXL 16k: no
    assert not cres_attention_fits(16384, 640)


def test_layer_routes_cres(monkeypatch):
    """The Attention layer produces identical outputs with the cres path
    forced on vs off (einsum), in interpret mode — and the cres branch must
    keep the SAME param structure (to_out kernel/bias) as the default."""
    from gswm.models.layers import Attention

    monkeypatch.setenv("GSWM_FORCE_FLASH", "1")
    monkeypatch.setenv("GSWM_CRES_ATTN", "1")
    monkeypatch.setenv("GSWM_CRES_ATTN_MIN_SEQ", "256")
    b, s, c, h, d = 1, 256, 96, 3, 64
    x = jax.random.normal(jax.random.key(2), (b, s, c))
    mod = Attention(heads=h, head_dim=d, dtype=jnp.float32)
    params = mod.init(jax.random.key(3), x)
    assert mod.bind(params)._use_cres(x)
    got = mod.apply(params, x)
    monkeypatch.delenv("GSWM_CRES_ATTN")
    monkeypatch.setenv("GSWM_FLASH_MIN_SEQ", "99999")  # einsum reference
    want = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_vae_attention_chunked_mode(monkeypatch):
    """GSWM_VAE_ATTN=chunked must (a) match the einsum path exactly and
    (b) differentiate — the pallas flash kernel's JVP asserts, which broke
    VAE fitting the first time a fit stage crossed the flash threshold
    (96x96 latents, tools/fit_sd21_vae.py round 4)."""
    from gswm.models.layers import VAEAttention

    b, h, w, c = 1, 40, 40, 32  # 1600 tokens: above the chunked floor
    x = jax.random.normal(jax.random.key(5), (b, h, w, c))
    mod = VAEAttention(norm_groups=8, dtype=jnp.float32)
    params = mod.init(jax.random.key(6), x)
    want = mod.apply(params, x)  # einsum path (no flash off-TPU)
    monkeypatch.setenv("GSWM_VAE_ATTN", "chunked")
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def loss(p):
        return jnp.sum(mod.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
