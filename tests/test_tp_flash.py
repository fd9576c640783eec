"""TP x flash-attention (VERDICT r1 weak #4 / next #5): the Pallas kernel
under a tensor-parallel mesh, on the virtual CPU mesh in interpret mode.

How it partitions: flash_attention_sharded wraps the pallas_call in
shard_map with the HEAD axis on 'tp' (attention is independent per head, so
no collectives are needed inside; the Megatron all-reduce happens at the
row-parallel to_out projection).  GSPMD cannot partition an opaque
pallas_call on its own — without the wrapper a tp mesh would replicate the
whole kernel per device.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gswm.ops.attention import (
    flash_attention,
    flash_attention_sharded,
    reference_attention,
)
from gswm.sharding import batch_sharding, make_mesh, shard_params

pytestmark = [
    pytest.mark.slow,  # compile-heavy; quick loop: -m 'not slow'
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
]


def _qkv(b=4, s=512, h=4, d=32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    shape = (b, s, h, d)
    return tuple(jax.random.normal(k, shape, jnp.float32) for k in ks)


def test_sharded_kernel_matches_unsharded_and_reference():
    q, k, v = _qkv()
    want_ref = np.asarray(reference_attention(q, k, v))
    want_flash = np.asarray(flash_attention(q, k, v))

    mesh = make_mesh(tp=2)
    spec = NamedSharding(mesh, P("dp", None, "tp", None))
    with jax.sharding.set_mesh(mesh):
        qs, ks_, vs = (jax.device_put(t, spec) for t in (q, k, v))
        got = np.asarray(jax.jit(flash_attention_sharded)(qs, ks_, vs))
    np.testing.assert_allclose(got, want_flash, atol=2e-5)
    np.testing.assert_allclose(got, want_ref, atol=2e-4)


def test_sharded_kernel_tp_only_mesh():
    # tp=8: one head per device is not possible (4 heads), wrapper must
    # fall back to the unsharded kernel rather than crash
    q, k, v = _qkv(h=4)
    mesh = make_mesh(tp=8)
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(jax.jit(flash_attention_sharded)(q, k, v))
    np.testing.assert_allclose(got, np.asarray(flash_attention(q, k, v)),
                               atol=2e-5)


def test_unet_tp_flash_matches_unsharded():
    """tiny-xl UNet at 1024 attention tokens (>= flash_min_seq) under a
    dp=4 x tp=2 mesh with tp-sharded params: the model output must match the
    single-device forced-flash run.  This is the BASELINE config-4 shape:
    SDXL-family arch + sharded transformer + the flash kernel actually
    engaged (tiny shapes previously fell through to the einsum path)."""
    from gswm.models import UNet2DCondition
    from gswm.models.configs import PRESETS

    os.environ["GSWM_FORCE_FLASH"] = "1"
    try:
        preset = PRESETS["tiny-xl"]
        unet = UNet2DCondition(preset.unet, dtype=jnp.float32)
        # latent 64x64 -> level-1 seq = 32*32 = 1024 tokens >= flash_min_seq
        params = unet.init_params(jax.random.key(0), latent_hw=(64, 64),
                                  context_len=77)
        lat = jax.random.normal(jax.random.key(1), (4, 4, 64, 64), jnp.float32)
        t = jnp.full((4,), 500, jnp.int32)
        ctx = jax.random.normal(jax.random.key(2),
                                (4, 77, preset.unet.cross_attn_dim),
                                jnp.float32)
        added = {
            "text_embeds": jnp.zeros((4, preset.unet.addition_embed_dim - 6 * 256)),
            "time_ids": jnp.zeros((4, 6)),
        }

        single = np.asarray(unet.apply(params, lat, t, ctx, added))

        mesh = make_mesh(tp=2)
        params_s = shard_params(params, mesh)
        with jax.sharding.set_mesh(mesh):
            lat_s = jax.device_put(lat, batch_sharding(mesh))
            ctx_s = jax.device_put(ctx, NamedSharding(mesh, P("dp", None, None)))
            added_s = jax.device_put(
                added, NamedSharding(mesh, P("dp", None)))
            sharded = np.asarray(
                jax.jit(unet.apply)(params_s, lat_s, t, ctx_s, added_s)
            )
        np.testing.assert_allclose(sharded, single, atol=5e-4, rtol=5e-4)
    finally:
        os.environ.pop("GSWM_FORCE_FLASH", None)
