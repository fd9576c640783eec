"""HF checkpoint -> Flax params conversion (safetensors, offline).

The reference pulls weights from the HF hub every run through diffusers
(extract.py:56-60 — and rebuilds the pipeline per image, which SURVEY.md §3.2
flags as a major inefficiency).  Here weights load once from a local
diffusers-layout directory:

    model_dir/
      unet/diffusion_pytorch_model.safetensors
      vae/diffusion_pytorch_model.safetensors
      text_encoder/model.safetensors

Torch tensors are renamed + re-laid-out into our NHWC/HWIO Flax trees:
  * Conv weight  OIHW -> HWIO
  * Linear weight (out, in) -> (in, out)
  * torch attention ``to_out.0`` -> ``to_out``; GEGLU ``net.0.proj`` etc.
No network access: everything is local-files-only.
"""

from __future__ import annotations

import os
import re
from typing import Dict

import jax.numpy as jnp
import numpy as np


def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def _assign(tree: dict, dotted: str, value: np.ndarray):
    parts = dotted.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = jnp.asarray(value)


def _convert_tensor(name: str, t: np.ndarray) -> tuple[str, np.ndarray] | None:
    """Map one torch tensor (diffusers naming) to (flax_path, array)."""
    n = name

    # normalizations: weight/bias -> scale/bias
    if re.search(r"(norm\d?|group_norm|conv_norm_out|layer_norm|norm_out)\.weight$", n):
        return n.rsplit(".", 1)[0] + ".scale", t
    if n.endswith("norm.weight"):
        return n.rsplit(".", 1)[0] + ".scale", t

    if n.endswith(".weight"):
        base = n[: -len(".weight")]
        if t.ndim == 4:  # conv OIHW -> HWIO
            return base + ".kernel", t.transpose(2, 3, 1, 0)
        if t.ndim == 2:  # linear (out,in) -> (in,out)
            return base + ".kernel", t.T
        if t.ndim == 1:  # e.g. class embeddings / norms caught above
            return base + ".scale", t
    if n.endswith(".bias"):
        return n, t
    if n.endswith("position_ids"):
        return None
    return n, t


_RENAMES = [
    # attention output: torch Sequential to_out.0 -> our to_out
    (re.compile(r"\.to_out\.0\."), ".to_out."),
    # GEGLU: ff.net.0.proj -> ff.net_0.proj ; ff.net.2 -> ff.net_2
    (re.compile(r"\.ff\.net\.0\.proj\."), ".ff.net_0.proj."),
    (re.compile(r"\.ff\.net\.2\."), ".ff.net_2."),
    # time embedding mlp
    (re.compile(r"^time_embedding\.linear_1\."), "time_embedding.linear_1."),
    # VAE legacy attention names (diffusers >=0.18 uses to_q/.. already; map
    # the old query/key/value/proj_attn if present)
    (re.compile(r"\.query\."), ".to_q."),
    (re.compile(r"\.key\."), ".to_k."),
    (re.compile(r"\.value\."), ".to_v."),
    (re.compile(r"\.proj_attn\."), ".to_out."),
]


def _rename(n: str) -> str:
    # list indices: down_blocks.0.resnets.1.xxx -> down_blocks_0.resnets_1.xxx
    for pat, rep in _RENAMES:
        n = pat.sub(rep, n)
    n = re.sub(
        r"\b(down_blocks|up_blocks|resnets|attentions|transformer_blocks|"
        r"downsamplers|upsamplers)\.(\d+)",
        r"\1_\2",
        n,
    )
    n = re.sub(r"\bmid_block\.(resnets|attentions)\.(\d+)", r"mid_block.\1_\2", n)
    return n


def convert_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """diffusers torch state dict -> Flax param tree (our module names)."""
    tree: dict = {}
    for name, t in sd.items():
        renamed = _rename(name)
        conv = _convert_tensor(renamed, t)
        if conv is None:
            continue
        path, arr = conv
        _assign(tree, path, arr)
    return tree


def _check_against(template: dict, loaded: dict, prefix=""):
    """Shape-check the converted tree against an init template; returns list
    of mismatches (missing keys / wrong shapes)."""
    problems = []
    for k, v in template.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            sub = loaded.get(k)
            if not isinstance(sub, dict):
                problems.append(f"missing subtree {path}")
            else:
                problems.extend(_check_against(v, sub, path))
        else:
            arr = loaded.get(k)
            if arr is None:
                problems.append(f"missing {path}")
            elif tuple(arr.shape) != tuple(v.shape):
                problems.append(f"shape {path}: ckpt {arr.shape} vs model {v.shape}")
    return problems


def load_unet_params(model_dir: str, template: dict | None = None) -> dict:
    sd = _load_safetensors(
        os.path.join(model_dir, "unet", "diffusion_pytorch_model.safetensors")
    )
    tree = convert_state_dict(sd)
    if template is not None:
        problems = _check_against(template["params"], tree)
        if problems:
            raise ValueError(
                "unet checkpoint/model mismatch:\n" + "\n".join(problems[:40])
            )
    return {"params": tree}


def load_vae_params(model_dir: str, template: dict | None = None) -> dict:
    sd = _load_safetensors(
        os.path.join(model_dir, "vae", "diffusion_pytorch_model.safetensors")
    )
    tree = convert_state_dict(sd)
    if template is not None:
        problems = _check_against(template["params"], tree)
        if problems:
            raise ValueError(
                "vae checkpoint/model mismatch:\n" + "\n".join(problems[:40])
            )
    return {"params": tree}


def load_text_params(model_dir: str):
    """Text encoder via transformers' own torch->flax conversion."""
    from transformers import FlaxCLIPTextModel

    model = FlaxCLIPTextModel.from_pretrained(
        os.path.join(model_dir, "text_encoder"), from_pt=True,
        local_files_only=True,
    )
    return model.params


def load_text2_params(model_dir: str):
    """SDXL second text encoder (text_encoder_2/, a
    CLIPTextModelWithProjection): returns (flax_params, projection) where
    ``projection`` is the (hidden, out) text_projection matrix applied to
    the pooled output that feeds added_cond.text_embeds."""
    import glob

    d = os.path.join(model_dir, "text_encoder_2")
    from transformers import FlaxCLIPTextModel

    model = FlaxCLIPTextModel.from_pretrained(
        d, from_pt=True, local_files_only=True)
    projection = None
    for f in sorted(glob.glob(os.path.join(d, "*.safetensors"))):
        sd = _load_safetensors(f)
        for k, t in sd.items():
            if k.endswith("text_projection.weight"):
                projection = jnp.asarray(t.T)  # (out,in) -> (in,out)
    return model.params, projection
