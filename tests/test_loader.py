"""HF->Flax weight converter, exercised against a synthetic diffusers-layout
state dict derived from the model's own init template (full coverage of every
parameter name/shape the tiny UNet and VAE contain)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gswm.models import TINY, AutoencoderKL, UNet2DCondition
from gswm.models.loader import _check_against, convert_state_dict


def _flax_tree_to_torch_sd(tree, prefix=""):
    """Inverse of the converter: emit diffusers/torch-style names + layouts
    from our Flax tree, so convert_state_dict must map them back exactly."""
    sd = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            sd.update(_flax_tree_to_torch_sd(v, path))
            continue
        # our module names use underscores for list indices; torch uses dots
        import re

        torch_path = re.sub(
            r"\b(down_blocks|up_blocks|resnets|attentions|transformer_blocks|"
            r"downsamplers|upsamplers)_(\d+)",
            r"\1.\2",
            path,
        )
        torch_path = torch_path.replace(".net_0.proj.", ".net.0.proj.")
        torch_path = torch_path.replace(".net_2.", ".net.2.")
        arr = np.asarray(v)
        if k == "kernel":
            name = torch_path.rsplit(".", 1)[0] + ".weight"
            if "attn1" in path or "attn2" in path:
                if ".to_out." in torch_path:
                    name = name.replace(".to_out.", ".to_out.0.")
            if arr.ndim == 4:  # HWIO -> OIHW
                sd[name] = arr.transpose(3, 2, 0, 1)
            else:  # (in, out) -> (out, in)
                sd[name] = arr.T
        elif k == "scale":
            sd[torch_path.rsplit(".", 1)[0] + ".weight"] = arr
        else:  # bias
            name = torch_path
            if ("attn1" in path or "attn2" in path) and ".to_out." in name:
                name = name.replace(".to_out.", ".to_out.0.")
            sd[name] = arr
        # make tensors distinguishable from init for a content check
    return sd


def _randomize(sd, seed=0):
    rng = np.random.default_rng(seed)
    return {k: rng.normal(size=v.shape).astype(np.float32) for k, v in sd.items()}


@pytest.mark.parametrize("which", ["unet", "vae"])
def test_converter_roundtrip_full_coverage(which):
    if which == "unet":
        model = UNet2DCondition(TINY.unet)
        template = model.init_params(jax.random.key(0), context_len=8)
    else:
        model = AutoencoderKL(TINY.vae)
        template = model.init(jax.random.key(0), jnp.zeros((1, 3, 16, 16)))

    sd = _randomize(_flax_tree_to_torch_sd(template["params"]))
    tree = convert_state_dict(sd)
    problems = _check_against(template["params"], tree)
    assert not problems, problems[:10]

    # content check on a couple of representative leaves
    def get(tree, dotted):
        node = tree
        for p in dotted.split("."):
            node = node[p]
        return np.asarray(node)

    if which == "unet":
        k = get(tree, "conv_in.kernel")
        assert k.shape == get(template["params"], "conv_in.kernel").shape
        np.testing.assert_array_equal(
            k, sd["conv_in.weight"].transpose(2, 3, 1, 0)
        )
        q = get(tree, "down_blocks_0.attentions_0.transformer_blocks_0.attn1.to_q.kernel")
        np.testing.assert_array_equal(
            q,
            sd["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight"].T,
        )
    else:
        s = get(tree, "encoder.conv_norm_out.scale")
        np.testing.assert_array_equal(s, sd["encoder.conv_norm_out.weight"])


def test_converter_flags_shape_mismatch():
    model = AutoencoderKL(TINY.vae)
    template = model.init(jax.random.key(0), jnp.zeros((1, 3, 16, 16)))
    sd = _randomize(_flax_tree_to_torch_sd(template["params"]))
    sd["encoder.conv_in.weight"] = np.zeros((7, 7, 7, 7), np.float32)
    tree = convert_state_dict(sd)
    problems = _check_against(template["params"], tree)
    assert any("encoder.conv_in" in p for p in problems)


def test_legacy_vae_attention_names():
    """diffusers <0.18 used query/key/value/proj_attn in VAE attention."""
    sd = {
        "mid_block.attentions.0.query.weight": np.zeros((8, 8), np.float32),
        "mid_block.attentions.0.proj_attn.bias": np.zeros((8,), np.float32),
    }
    tree = convert_state_dict(sd)
    assert "to_q" in tree["mid_block"]["attentions_0"]
    assert "to_out" in tree["mid_block"]["attentions_0"]
