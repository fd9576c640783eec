"""Distributed tests on the 8-device virtual CPU mesh (SURVEY.md §4):
DP-sharded embed/extract must be bit-identical to single-device, and the
DP x TP pipeline step must compile and run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gswm.config import GSConfig
from gswm.core import bits as bitops
from gswm.core.decode import recover_message_bits
from gswm.core.embed import embed_latents
from gswm.sharding import batch_sharding, make_mesh, shard_params, unet_param_specs

pytestmark = [
    pytest.mark.slow,  # compile-heavy; quick loop: -m 'not slow'
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
]


def _cfg():
    return GSConfig(key_hex="22" * 32, nonce_hex="33" * 16, message="mesh",
                    width=64, height=64, vae_scale=8, message_bits=32)


def test_mesh_shapes():
    mesh = make_mesh(tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh_dp = make_mesh()
    assert mesh_dp.shape == {"dp": 8, "tp": 1}


def test_dp_sharded_decode_matches_single_device():
    cfg = _cfg()
    lat, msg = embed_latents(cfg, rng=jax.random.key(0), batch=8)
    single = np.asarray(recover_message_bits(lat, cfg))

    mesh = make_mesh()
    lat_sharded = jax.device_put(lat, batch_sharding(mesh))
    sharded = np.asarray(recover_message_bits(lat_sharded, cfg))
    np.testing.assert_array_equal(single, sharded)
    np.testing.assert_array_equal(single[0], bitops.bytes_to_bits(msg))


def test_dp_tp_pipeline_step():
    """Full watermark step (embed -> 2-step denoise -> 2-step invert ->
    decode) under jit on a dp x tp mesh with tp-sharded UNet params."""
    from gswm.pipelines import InversablePipeline

    mesh = make_mesh(tp=2)
    pipe = InversablePipeline("tiny", rng=jax.random.key(0))
    cfg = _cfg()

    params = shard_params(pipe.unet_params, mesh)
    zT, msg = embed_latents(cfg, rng=jax.random.key(1), batch=4)
    ctx = pipe.empty_context(4)

    with jax.sharding.set_mesh(mesh):
        zT_s = jax.device_put(zT, batch_sharding(mesh))
        ctx_s = jax.device_put(ctx, NamedSharding(mesh, P("dp", None, None)))
        x0 = pipe._run(params, zT_s, ctx_s, ctx_s, jnp.float32(1.0),
                       num_steps=2, scheduler="DDIM", guidance_mode=False,
                       invert=False)
        z_back = pipe._run(params, x0, ctx_s, ctx_s, jnp.float32(1.0),
                           num_steps=2, scheduler="DDIM", guidance_mode=False,
                           invert=True)
    voted = np.asarray(recover_message_bits(z_back, cfg))
    acc = float(np.mean(voted == bitops.bytes_to_bits(msg)))
    assert acc == 1.0, acc


def test_param_specs_cover_attention():
    from gswm.pipelines import InversablePipeline

    pipe = InversablePipeline("tiny", rng=jax.random.key(0))
    specs = unet_param_specs(pipe.unet_params)
    flat = jax.tree.leaves_with_path(specs, is_leaf=lambda x: isinstance(x, P))
    tp_specs = [s for _, s in flat if "tp" in str(s)]
    assert len(tp_specs) >= 8  # q,k,v,out x attn1,attn2 + ff pairs
