"""End-to-end checkpoint loading: synthesize a diffusers-layout checkpoint
directory on disk (safetensors, torch naming/layouts) for the TINY preset and
load it through InversablePipeline(model_dir=...) — the path real SD weights
take (SURVEY.md §7.3 "HF->Flax weight conversion")."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gswm.models import TINY, AutoencoderKL, UNet2DCondition
from tests.test_loader import _flax_tree_to_torch_sd

pytestmark = pytest.mark.slow  # on-disk checkpoint synth + load; quick loop: -m 'not slow'


def _save_safetensors(sd: dict, path):
    from safetensors.numpy import save_file

    # transposed views must be made contiguous: safetensors writes the raw
    # buffer and silently ignores strides
    save_file(
        {k: np.ascontiguousarray(np.asarray(v, dtype=np.float32))
         for k, v in sd.items()},
        str(path),
    )


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt")
    rng = jax.random.key(0)

    unet = UNet2DCondition(TINY.unet)
    u_params = unet.init_params(jax.random.key(1),
                                context_len=TINY.text.max_length)
    (root / "unet").mkdir()
    _save_safetensors(_flax_tree_to_torch_sd(u_params["params"]),
                      root / "unet" / "diffusion_pytorch_model.safetensors")

    vae = AutoencoderKL(TINY.vae)
    v_params = vae.init(jax.random.key(2), jnp.zeros((1, 3, 16, 16)))
    (root / "vae").mkdir()
    _save_safetensors(_flax_tree_to_torch_sd(v_params["params"]),
                      root / "vae" / "diffusion_pytorch_model.safetensors")

    # text encoder: real HF torch checkpoint for the tiny CLIP config
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=TINY.text.vocab_size,
        hidden_size=TINY.text.hidden_size,
        intermediate_size=TINY.text.hidden_size * 4,
        num_hidden_layers=TINY.text.num_layers,
        num_attention_heads=TINY.text.num_heads,
        max_position_embeddings=TINY.text.max_length,
        hidden_act=TINY.text.hidden_act,
    )
    with torch.no_grad():
        tm = CLIPTextModel(cfg)
    tm.save_pretrained(root / "text_encoder", safe_serialization=False)
    return root, u_params, v_params


def test_pipeline_loads_checkpoint_dir(ckpt_dir):
    root, u_params, v_params = ckpt_dir
    from gswm.pipelines import InversablePipeline

    pipe = InversablePipeline("tiny", model_dir=str(root))

    # loaded == original leaves, exactly
    orig = jax.tree.leaves(u_params["params"])
    got = jax.tree.leaves(pipe.unet_params["params"])
    assert len(orig) == len(got)
    for a, b in zip(orig, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the pipeline actually runs generate/invert with loaded weights
    zT = pipe.get_random_latents(jax.random.key(3), batch=1, height=16,
                                 width=16)
    x0 = pipe.generate(zT, guidance_scale=1.0, num_steps=2, decode=False)
    z = pipe.invert(latents=x0, num_steps=2)
    assert z.shape == zT.shape


def test_loader_rejects_wrong_architecture(ckpt_dir, tmp_path):
    root, _, _ = ckpt_dir
    from gswm.models.loader import load_unet_params

    unet_big = UNet2DCondition(TINY.unet.__class__(
        block_out_channels=(48, 96), layers_per_block=1,
        cross_attn_levels=(True, False), num_heads=2, cross_attn_dim=32,
        norm_groups=8,
    ))
    template = unet_big.init_params(jax.random.key(0), context_len=8)
    with pytest.raises(ValueError, match="mismatch"):
        load_unet_params(str(root), template)
