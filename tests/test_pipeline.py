"""Closed-loop pipeline tests with the TINY preset (SURVEY.md §4: "embed ->
tiny-UNet DDIM round trip").  Random weights are fine: inversion fidelity is a
property of the ODE solver pair, not of the weight values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gswm.config import GSConfig
from gswm.core import bits as bitops
from gswm.core.decode import recover_message_bits
from gswm.core.embed import embed_latents
from gswm.pipelines import InversablePipeline

KEY_HEX = "22" * 32
NONCE_HEX = "33" * 16


pytestmark = pytest.mark.slow  # compile-heavy; quick loop: -m 'not slow'


@pytest.fixture(scope="module")
def pipe():
    return InversablePipeline("tiny", rng=jax.random.key(0))


def _cfg(**kw):
    base = dict(
        key_hex=KEY_HEX, nonce_hex=NONCE_HEX, message="lthero",
        width=64, height=64, message_bits=32,
    )
    base.update(kw)
    return GSConfig(**base)


def test_latent_denoise_invert_roundtrip(pipe):
    """Z_T -> x0 latents -> inverted Z_T without the VAE: the solver pair
    must preserve watermark bits at high accuracy."""
    cfg = _cfg()
    zT, msg = embed_latents(cfg, rng=jax.random.key(5))
    x0 = pipe.generate(zT, guidance_scale=1.0, num_steps=20, decode=False)
    z_back = pipe.invert(latents=x0, num_steps=20)
    voted = np.asarray(recover_message_bits(z_back, cfg))[0]
    acc = float(np.mean(voted == bitops.bytes_to_bits(msg)))
    assert acc == 1.0, acc
    # raw element-wise sign survival should already be decent pre-vote
    sign = float(jnp.mean((z_back > 0) == (zT > 0)))
    assert sign > 0.8, sign


@pytest.fixture(scope="module")
def fitted_pipe():
    """Tiny pipeline whose VAE is briefly fitted so encode approximately
    inverts decode.  A *random* VAE destroys the latents entirely (any
    image-roundtrip accuracy above 0.5 would be seed luck); a real SD VAE is
    near-lossless for the posterior mean.  A few hundred Adam steps on
    ``encode(clip(decode(z))) ~= z`` puts the tiny VAE in the same regime so
    this test measures the full extract.py:31-43+46-70 chain, not luck."""
    from gswm.utils.fitting import fit_vae_roundtrip

    pipe = InversablePipeline("tiny", rng=jax.random.key(0))
    return fit_vae_roundtrip(pipe)


def test_full_image_roundtrip(fitted_pipe):
    """Z_T -> image (VAE decode) -> VAE encode -> invert -> decode bits.
    BASELINE config 2 shape, tiny scale.  The tiny VAE has 2 levels, so its
    spatial factor is 2 (not SD's 8): 8x8 latent <-> 16x16 image."""
    cfg = _cfg(width=16, height=16, vae_scale=2)
    zT, msg = embed_latents(cfg, rng=jax.random.key(6))
    img = fitted_pipe.generate(zT, guidance_scale=1.0, num_steps=20,
                               decode=True)
    assert img.shape == (1, 3, 16, 16)
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
    z_back = fitted_pipe.invert(images=img, num_steps=20)
    voted = np.asarray(recover_message_bits(z_back, cfg))[0]
    acc = float(np.mean(voted == bitops.bytes_to_bits(msg)))
    # fitted VAE + exact-inversion solver: the vote should recover nearly
    # all bits (real SD weights give ~1.0, README.md:15; this fit gives 1.0)
    assert acc > 0.9, acc


def test_extract_bits_matches_split_path(pipe):
    """The fused one-dispatch extraction (extract_bits) must return exactly
    the invert + recover_message_bits result — same scan, same decode chain,
    one jit (the serving shape of extract.py:46-101)."""
    cfg = _cfg()
    zT, msg = embed_latents(cfg, rng=jax.random.key(11), batch=2)
    x0 = pipe.generate(zT, guidance_scale=1.0, num_steps=8, decode=False)
    z_split = pipe.invert(latents=x0, num_steps=8)
    voted_split = np.asarray(recover_message_bits(z_split, cfg))
    voted_fused, z_fused = pipe.extract_bits(cfg, latents=x0, num_steps=8)
    assert np.array_equal(np.asarray(voted_fused), voted_split)
    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_split),
                               rtol=0, atol=1e-6)
    assert voted_split.shape == (2, 32)


def test_guidance_path_runs(pipe):
    cfg = _cfg()
    zT, _ = embed_latents(cfg, rng=jax.random.key(7))
    ids = np.array([[1, 5, 9] + [0] * 74], dtype=np.int32)
    img = pipe.generate(zT, prompt_ids=ids, guidance_scale=7.5, num_steps=4)
    assert img.shape == (1, 3, 16, 16)


def test_dpm_scheduler_path(pipe):
    cfg = _cfg()
    zT, msg = embed_latents(cfg, rng=jax.random.key(8))
    x0 = pipe.generate(zT, guidance_scale=1.0, num_steps=20, decode=False,
                       scheduler="DPMs")
    z_back = pipe.invert(latents=x0, num_steps=20, scheduler="DPMs")
    voted = np.asarray(recover_message_bits(z_back, cfg))[0]
    acc = float(np.mean(voted == bitops.bytes_to_bits(msg)))
    assert acc > 0.9, acc


def test_refinement_improves_inversion(pipe):
    cfg = _cfg()
    zT, _ = embed_latents(cfg, rng=jax.random.key(9))
    x0 = pipe.generate(zT, guidance_scale=1.0, num_steps=10, decode=False)
    z0 = pipe.invert(latents=x0, num_steps=10, refine=0)
    z2 = pipe.invert(latents=x0, num_steps=10, refine=2)
    e0 = float(jnp.mean(jnp.abs(z0 - zT)))
    e2 = float(jnp.mean(jnp.abs(z2 - zT)))
    assert e2 <= e0 * 1.05, (e0, e2)


def test_batch_shapes(pipe):
    cfg = _cfg()
    zT, msg = embed_latents(cfg, rng=jax.random.key(10), batch=3)
    x0 = pipe.generate(zT, guidance_scale=1.0, num_steps=4, decode=False)
    assert x0.shape == (3, 4, 8, 8)
    z_back = pipe.invert(latents=x0, num_steps=4)
    voted = np.asarray(recover_message_bits(z_back, cfg))
    assert voted.shape == (3, 32)


def test_weights_dtype_cast_is_applied_and_runs():
    """weights_dtype=bf16 (the SDXL-on-16GB mode) must cast every floating
    param via the donated jit and still denoise correctly."""
    p = InversablePipeline("tiny", rng=jax.random.key(3),
                           weights_dtype=jnp.bfloat16)
    leaves = [l for l in jax.tree.leaves(p.unet_params)
              if jnp.issubdtype(l.dtype, jnp.floating)]
    assert leaves and all(l.dtype == jnp.bfloat16 for l in leaves)
    out = p.generate(jax.random.normal(jax.random.key(4), (1, 4, 8, 8)),
                     guidance_scale=1.0, num_steps=2, decode=False)
    assert out.shape == (1, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_vae_chunk_scales_with_resolution(pipe):
    """The chunk budget shrinks with pixel count, and the decode path
    accounts for its image-sized output activations."""
    img_512 = jnp.zeros((1, 3, 512, 512))
    img_768 = jnp.zeros((1, 3, 768, 768))
    c512 = pipe._vae_chunk_for(img_512)
    c768 = pipe._vae_chunk_for(img_768)
    assert c768 < c512 == pipe.vae_chunk
    # decode is budgeted 8x more conservatively than encode at the same
    # pixel count (up-block fp32 temporaries + GroupNorm NCHW copies;
    # 768px batch-8 and 1024px batch-2 decode OOMs, r4b2/r4e).
    # tiny's VAE factor is 2, so 256x256 latents decode to 512px images.
    lat_512px = jnp.zeros((1, pipe.preset.vae.latent_channels, 256, 256))
    lat_768px = jnp.zeros((1, pipe.preset.vae.latent_channels, 384, 384))
    assert pipe._vae_chunk_for(lat_512px) == pipe.vae_chunk // 8
    assert 1 <= pipe._vae_chunk_for(lat_768px) < pipe._vae_chunk_for(lat_512px)
