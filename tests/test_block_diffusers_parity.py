"""Model-block forward parity vs independent re-derivations of diffusers'
math (VERDICT r2 missing #1 / next #2).

The weight manifests (tests/test_manifest_loading.py) prove every
real-checkpoint tensor has a home with the right shape; these tests prove
the *math* at that home matches what diffusers computes on those tensors —
norm placement and epsilons, silu-vs-gelu choices, time-emb broadcast,
asymmetric VAE padding, projection-variant reshape order, head split.

Method (same strategy tests/test_dpm_diffusers_parity.py used for the
scheduler): each diffusers block forward is RE-DERIVED here on top of torch
functional ops — an implementation with no code shared with gswm's Flax
modules — from the update rules in diffusers' sources:
  * ResnetBlock2D            diffusers/models/resnet.py (norm1->silu->conv1
                             -> +time_emb_proj(silu(temb)) -> norm2->silu->
                             conv2 -> +shortcut; UNet eps 1e-5, VAE 1e-6)
  * BasicTransformerBlock    diffusers/models/attention.py (pre-LN eps 1e-5;
                             GEGLU with EXACT erf gelu; attn1 self/attn2
                             cross; to_q/k/v no bias, to_out[0] bias)
  * Transformer2DModel       diffusers/models/transformer_2d.py (GroupNorm
                             eps 1e-6; use_linear_projection reshape order)
  * VAE Encoder Downsample2D asymmetric F.pad (0,1,0,1) + VALID stride-2
  * Upsample2D               F.interpolate nearest x2 + conv
  * VAE mid Attention        single-head, q/k/v/out all biased, GN eps 1e-6
  * get_timestep_embedding   diffusers/models/embeddings.py
The reference hits this math through extract.py:56-69 (the UNet inversion
loop + VAE encode every published claim is measured on).

All comparisons run fp32 on small fixed tensors with tight tolerances: a
drift in any epsilon, activation, or reshape fails loudly.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gswm.models.layers import (
    Attention,
    BasicTransformerBlock,
    Downsample,
    ResnetBlock,
    Transformer2D,
    Upsample,
    VAEAttention,
    timestep_embedding,
)

ATOL = 3e-5


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def conv_w(p):
    """Flax HWIO conv kernel -> torch OIHW."""
    return t(p["kernel"]).permute(3, 2, 0, 1)


def lin_w(p):
    """Flax (in, out) dense kernel -> torch Linear (out, in)."""
    return t(p["kernel"]).T.contiguous()


def gn(x, groups, p, eps):
    return F.group_norm(x, groups, t(p["scale"]), t(p["bias"]), eps)


def ln(x, p, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), t(p["scale"]), t(p["bias"]), eps)


# ---------------------------------------------------------------- resnet --


def torch_resnet_block(x_nhwc, temb, p, *, groups, eps, has_shortcut):
    """diffusers ResnetBlock2D.forward re-derivation (resnet.py)."""
    x = t(x_nhwc).permute(0, 3, 1, 2)
    h = F.silu(gn(x, groups, p["norm1"], eps))
    h = F.conv2d(h, conv_w(p["conv1"]), t(p["conv1"]["bias"]), padding=1)
    if temb is not None:
        te = F.linear(F.silu(t(temb)), lin_w(p["time_emb_proj"]),
                      t(p["time_emb_proj"]["bias"]))
        h = h + te[:, :, None, None]
    h = F.silu(gn(h, groups, p["norm2"], eps))
    h = F.conv2d(h, conv_w(p["conv2"]), t(p["conv2"]["bias"]), padding=1)
    if has_shortcut:
        x = F.conv2d(x, conv_w(p["conv_shortcut"]),
                     t(p["conv_shortcut"]["bias"]))
    return (x + h).permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("eps,in_ch,out_ch", [
    (1e-5, 32, 32),   # UNet resnet, identity shortcut
    (1e-5, 16, 32),   # UNet resnet, 1x1 conv shortcut
    (1e-6, 32, 32),   # VAE resnet epsilon
])
def test_resnet_block_matches_diffusers(eps, in_ch, out_ch):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, in_ch).astype(np.float32)
    temb = rng.randn(2, 24).astype(np.float32)
    use_temb = eps == 1e-5
    mod = ResnetBlock(out_ch, norm_groups=8, use_time_emb=use_temb,
                      norm_eps=eps)
    params = mod.init(jax.random.key(0), jnp.asarray(x),
                      jnp.asarray(temb) if use_temb else None)
    got = np.asarray(mod.apply(params, jnp.asarray(x),
                               jnp.asarray(temb) if use_temb else None))
    want = torch_resnet_block(
        x, temb if use_temb else None, params["params"], groups=8, eps=eps,
        has_shortcut=in_ch != out_ch)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-5)


# ------------------------------------------------------------- attention --


def torch_attention(x, ctx, p, heads):
    """diffusers Attention (AttnProcessor) re-derivation: unbiased q/k/v,
    (b, s, h, d) head split, softmax(qk/sqrt(d)) @ v, biased to_out[0]."""
    b, s, _ = x.shape
    q = F.linear(x, lin_w(p["to_q"]))
    k = F.linear(ctx, lin_w(p["to_k"]))
    v = F.linear(ctx, lin_w(p["to_v"]))
    d = q.shape[-1] // heads

    def split(u):
        return u.reshape(b, -1, heads, d).permute(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    probs = torch.softmax(q @ k.transpose(-1, -2) * d**-0.5, dim=-1)
    out = (probs @ v).permute(0, 2, 1, 3).reshape(b, s, heads * d)
    return F.linear(out, lin_w(p["to_out"]), t(p["to_out"]["bias"]))


@pytest.mark.parametrize("cross", [False, True])
def test_attention_matches_diffusers(cross):
    rng = np.random.RandomState(1)
    x = rng.randn(2, 16, 32).astype(np.float32)
    ctx = rng.randn(2, 7, 24).astype(np.float32) if cross else None
    mod = Attention(heads=4, head_dim=8)
    params = mod.init(jax.random.key(1), jnp.asarray(x),
                      None if ctx is None else jnp.asarray(ctx))
    got = np.asarray(mod.apply(params, jnp.asarray(x),
                               None if ctx is None else jnp.asarray(ctx)))
    want = torch_attention(t(x), t(x if ctx is None else ctx),
                           params["params"], heads=4).numpy()
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-5)


def torch_basic_transformer_block(x, ctx, p, heads):
    """diffusers BasicTransformerBlock.forward re-derivation: three pre-LN
    (eps 1e-5) residual branches — self-attn, cross-attn, GEGLU feed-forward
    with the EXACT erf gelu (torch F.gelu default)."""
    x = x + torch_attention(ln(x, p["norm1"]), ln(x, p["norm1"]),
                            p["attn1"], heads)
    x = x + torch_attention(ln(x, p["norm2"]), ctx, p["attn2"], heads)
    h = ln(x, p["norm3"])
    proj = F.linear(h, lin_w(p["ff"]["net_0"]["proj"]),
                    t(p["ff"]["net_0"]["proj"]["bias"]))
    a, gate = proj.chunk(2, dim=-1)
    h = a * F.gelu(gate)   # exact erf gelu — NOT the tanh approximation
    return x + F.linear(h, lin_w(p["ff"]["net_2"]),
                        t(p["ff"]["net_2"]["bias"]))


def test_basic_transformer_block_matches_diffusers():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 16, 32).astype(np.float32)
    ctx = rng.randn(2, 7, 24).astype(np.float32)
    mod = BasicTransformerBlock(heads=4, head_dim=8)
    params = mod.init(jax.random.key(2), jnp.asarray(x), jnp.asarray(ctx))
    got = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(ctx)))
    want = torch_basic_transformer_block(t(x), t(ctx), params["params"],
                                         heads=4).numpy()
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-5)


def torch_transformer2d(x_nhwc, ctx, p, heads, linear_proj):
    """diffusers Transformer2DModel.forward re-derivation: GroupNorm eps
    1e-6, then EITHER reshape->Linear proj_in (SD2.x use_linear_projection)
    OR 1x1-conv proj_in->reshape (SD1.x) — order matters on the way out
    too — then blocks, then the mirrored proj_out, + residual."""
    x = t(x_nhwc).permute(0, 3, 1, 2)
    b, c, h, w = x.shape
    residual = x
    x = gn(x, 8, p["norm"], 1e-6)
    if linear_proj:
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        x = F.linear(x, lin_w(p["proj_in"]), t(p["proj_in"]["bias"]))
    else:
        x = F.conv2d(x, conv_w(p["proj_in"]), t(p["proj_in"]["bias"]))
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
    x = torch_basic_transformer_block(x, ctx, p["transformer_blocks_0"],
                                      heads)
    if linear_proj:
        x = F.linear(x, lin_w(p["proj_out"]), t(p["proj_out"]["bias"]))
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
    else:
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        x = F.conv2d(x, conv_w(p["proj_out"]), t(p["proj_out"]["bias"]))
    return (x + residual).permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("linear_proj", [False, True])
def test_transformer2d_matches_diffusers(linear_proj):
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 4, 32).astype(np.float32)
    ctx = rng.randn(2, 7, 24).astype(np.float32)
    mod = Transformer2D(heads=4, head_dim=8, depth=1,
                        use_linear_projection=linear_proj, norm_groups=8)
    params = mod.init(jax.random.key(3), jnp.asarray(x), jnp.asarray(ctx))
    got = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(ctx)))
    want = torch_transformer2d(x, t(ctx), params["params"], 4, linear_proj)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-5)


# ---------------------------------------------------------- up/downsample --


def test_vae_encoder_downsample_asymmetric_pad():
    """diffusers VAE encoder Downsample2D: F.pad (0,1,0,1) then VALID
    stride-2 conv (use_conv, padding=0)."""
    rng = np.random.RandomState(4)
    x = rng.randn(2, 9, 9, 16).astype(np.float32)  # odd size exposes the pad
    mod = Downsample(16, asymmetric_pad=True)
    params = mod.init(jax.random.key(4), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    xt = t(x).permute(0, 3, 1, 2)
    xt = F.pad(xt, (0, 1, 0, 1))
    p = params["params"]["conv"]
    want = F.conv2d(xt, conv_w(p), t(p["bias"]), stride=2)
    np.testing.assert_allclose(
        got, want.permute(0, 2, 3, 1).numpy(), atol=ATOL, rtol=1e-5)


def test_unet_downsample_symmetric_pad():
    rng = np.random.RandomState(5)
    x = rng.randn(2, 8, 8, 16).astype(np.float32)
    mod = Downsample(16, asymmetric_pad=False)
    params = mod.init(jax.random.key(5), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    p = params["params"]["conv"]
    want = F.conv2d(t(x).permute(0, 3, 1, 2), conv_w(p), t(p["bias"]),
                    stride=2, padding=1)
    np.testing.assert_allclose(
        got, want.permute(0, 2, 3, 1).numpy(), atol=ATOL, rtol=1e-5)


def test_upsample_matches_interpolate_nearest():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 5, 5, 16).astype(np.float32)
    mod = Upsample(16)
    params = mod.init(jax.random.key(6), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    xt = F.interpolate(t(x).permute(0, 3, 1, 2), scale_factor=2,
                       mode="nearest")
    p = params["params"]["conv"]
    want = F.conv2d(xt, conv_w(p), t(p["bias"]), padding=1)
    np.testing.assert_allclose(
        got, want.permute(0, 2, 3, 1).numpy(), atol=ATOL, rtol=1e-5)


# -------------------------------------------------------- VAE mid attn --


def test_vae_mid_attention_matches_diffusers():
    """diffusers VAE mid-block Attention: GN eps 1e-6, single head over the
    full channel dim, q/k/v/out ALL biased, scale C^-0.5, + residual."""
    rng = np.random.RandomState(7)
    x = rng.randn(2, 4, 4, 32).astype(np.float32)
    mod = VAEAttention(norm_groups=8)
    params = mod.init(jax.random.key(7), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    p = params["params"]
    xt = t(x).permute(0, 3, 1, 2)
    b, c, h, w = xt.shape
    hflat = gn(xt, 8, p["group_norm"], 1e-6)
    hflat = hflat.permute(0, 2, 3, 1).reshape(b, h * w, c)
    q = F.linear(hflat, lin_w(p["to_q"]), t(p["to_q"]["bias"]))
    k = F.linear(hflat, lin_w(p["to_k"]), t(p["to_k"]["bias"]))
    v = F.linear(hflat, lin_w(p["to_v"]), t(p["to_v"]["bias"]))
    probs = torch.softmax(q @ k.transpose(-1, -2) * c**-0.5, dim=-1)
    out = F.linear(probs @ v, lin_w(p["to_out"]), t(p["to_out"]["bias"]))
    want = (out.reshape(b, h, w, c) + t(x)).numpy()
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-5)


# --------------------------------------------------- timestep embedding --


@pytest.mark.parametrize("flip", [True, False])
def test_timestep_embedding_matches_diffusers(flip):
    """diffusers get_timestep_embedding: exponent over half_dim with
    downscale_freq_shift, sin|cos order flipped to cos|sin for SD."""
    ts = np.array([0.0, 1.0, 500.0, 999.0], np.float32)
    dim, shift = 32, 0.0
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half, dtype=np.float64) / (
        half - shift)
    ang = ts[:, None].astype(np.float64) * np.exp(exponent)[None, :]
    want = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
    if flip:
        want = np.concatenate([want[:, half:], want[:, :half]], axis=-1)
    got = np.asarray(timestep_embedding(jnp.asarray(ts), dim,
                                        flip_sin_to_cos=flip,
                                        freq_shift=shift))
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-4)


# ------------------------------------------------------------ CLIP text --


def _tiny_text_cfg(penultimate):
    from gswm.models.configs import TextConfig

    return TextConfig(vocab_size=512, hidden_size=32, num_layers=3,
                      num_heads=4, max_length=12, hidden_act="quick_gelu",
                      penultimate=penultimate)


@pytest.mark.parametrize("penultimate", [False, True])
def test_clip_text_encoder_matches_torch(penultimate, tmp_path):
    """gswm.models.text.TextEncoder vs the TORCH CLIPTextModel (the exact
    implementation diffusers' pipeline calls) with identical weights —
    including the SD2.x clip-skip path (penultimate hidden state + final
    layer norm, extract.py:56-69's text_encoder)."""
    torch.manual_seed(0)
    from transformers import CLIPTextConfig, CLIPTextModel, FlaxCLIPTextModel

    cfg = _tiny_text_cfg(penultimate)
    hf_cfg = CLIPTextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.hidden_size * 4,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_length, hidden_act=cfg.hidden_act,
        bos_token_id=cfg.vocab_size - 2, eos_token_id=cfg.vocab_size - 1,
    )
    pt = CLIPTextModel(hf_cfg).eval()
    pt.save_pretrained(tmp_path)
    fx = FlaxCLIPTextModel.from_pretrained(str(tmp_path), from_pt=True)

    from gswm.models.text import TextEncoder

    enc = TextEncoder(cfg)
    ids = enc.empty_prompt_ids(2)
    ids[1, 1] = 7  # one non-trivial token
    got = np.asarray(enc(jnp.asarray(ids), params=fx.params))

    with torch.no_grad():
        out = pt(torch.from_numpy(ids.astype(np.int64)),
                 output_hidden_states=True)
    with torch.no_grad():
        if penultimate:
            want = pt.text_model.final_layer_norm(
                out.hidden_states[-2]).numpy()
        else:
            want = out.last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
