"""Ring attention (sequence-parallel, gswm.ops.ring_attention) on the
virtual 8-device CPU mesh.

The long-context story SURVEY.md §5 scoped: shard the latent sequence over
an `sp` mesh axis, rotate K/V shards around the ring with ppermute, exact
online-softmax across ring steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gswm.ops.attention import reference_attention
from gswm.ops.ring_attention import ring_attention
from gswm.sharding import make_mesh

pytestmark = [
    pytest.mark.slow,  # compile-heavy; quick loop: -m 'not slow'
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
]


def _qkv(b=2, s=512, h=2, d=32, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(seed), 3)
    return tuple(jax.random.normal(k, (b, s, h, d), dtype) for k in ks)


def test_ring_matches_reference_sp8():
    q, k, v = _qkv()
    want = np.asarray(reference_attention(q, k, v))
    mesh = make_mesh(sp=8)
    assert mesh.axis_names == ("dp", "tp", "sp")
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(jax.jit(ring_attention)(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_ring_dp_x_sp():
    q, k, v = _qkv(b=4, seed=1)
    want = np.asarray(reference_attention(q, k, v))
    mesh = make_mesh(dp=2, sp=4)
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(jax.jit(ring_attention)(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_ring_output_stays_sequence_sharded():
    q, k, v = _qkv(seed=2)
    mesh = make_mesh(sp=8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    with jax.sharding.set_mesh(mesh):
        spec = NamedSharding(mesh, P(None, "sp", None, None))
        qs, ks_, vs = (jax.device_put(t, spec) for t in (q, k, v))
        out = jax.jit(ring_attention)(qs, ks_, vs)
        assert "sp" in str(out.sharding.spec)


def test_ring_falls_back_without_mesh():
    q, k, v = _qkv(s=256, seed=3)
    got = np.asarray(ring_attention(q, k, v))
    want = np.asarray(reference_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_ring_falls_back_on_indivisible_seq():
    # S=300 not divisible by sp=8 -> single-device path, still correct
    q, k, v = _qkv(s=300, seed=4)
    mesh = make_mesh(sp=8)
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(ring_attention(q, k, v))
    want = np.asarray(reference_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_model_attention_routes_to_ring_on_sp_mesh(monkeypatch):
    """The UNet Attention layer (via flash_attention_sharded) must pick the
    ring path when an sp>1 mesh is active and produce the same numbers."""
    from gswm.ops.attention import flash_attention_sharded

    q, k, v = _qkv(seed=6)
    want = np.asarray(reference_attention(q, k, v))
    mesh = make_mesh(sp=8)
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(jax.jit(flash_attention_sharded)(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_ring_bf16():
    q, k, v = _qkv(seed=5, dtype=jnp.bfloat16)
    want = np.asarray(
        reference_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32)
        )
    )
    mesh = make_mesh(sp=8)
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(jax.jit(ring_attention)(q, k, v), np.float32)
    np.testing.assert_allclose(got, want, atol=0.06)


def test_unet_forward_under_sp_mesh(monkeypatch):
    """The pipeline's OWN routing must reach ring attention under an sp
    mesh: a tiny UNet forward on a dp x sp mesh (flash forced, min-seq
    lowered to the tiny model's 64 lvl0 tokens) matches the single-device
    forward (VERDICT r2 next #5 — previously only raw tensors exercised
    the sp branch of flash_attention_sharded)."""
    from gswm.pipelines import InversablePipeline

    # fp32 compute: the check is routing + collectives EXACTNESS; bf16 would
    # fold ~3e-2 of accumulation-order noise into the comparison.
    pipe = InversablePipeline("tiny", rng=jax.random.key(0),
                              dtype=jnp.float32)
    zT = jax.random.normal(jax.random.key(1), (4, 4, 8, 8))
    ctx = pipe.empty_context(4)
    t = jnp.asarray([500] * 4, jnp.int32)
    want = np.asarray(pipe.unet.apply(pipe.unet_params, zT, t, ctx))

    monkeypatch.setenv("GSWM_FLASH_MIN_SEQ", "64")
    monkeypatch.setenv("GSWM_FORCE_FLASH", "1")
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(dp=4, tp=1, sp=2)
    with jax.sharding.set_mesh(mesh):
        zT_s = jax.device_put(zT, NamedSharding(mesh, P("dp")))
        ctx_s = jax.device_put(ctx, NamedSharding(mesh, P("dp")))
        got = np.asarray(
            jax.jit(pipe.unet.apply)(pipe.unet_params, zT_s, t, ctx_s))
    err = float(np.max(np.abs(got - want)))
    assert err < 1e-3, err
