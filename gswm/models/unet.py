"""UNet2DCondition — the denoiser (Flax linen, NHWC).

Architecture-equivalent to the UNet the reference drives through diffusers
(extract.py:56-69 inversion loop; hosts' samplers on the embed side), built
TPU-first: NHWC, bf16-friendly, static shapes, no Python control flow that
depends on traced values.  Parameter names line up with the HF checkpoint
layout so gswm.models.loader can attach real SD weights by renaming only.

Public convention: latents are NCHW (B, 4, H/8, W/8) like the reference;
transposition happens once at entry/exit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gswm.models.configs import UNetConfig
from gswm.models.layers import (
    Downsample,
    ResnetBlock,
    TimeEmbedding,
    Transformer2D,
    Upsample,
    GroupNorm32,
    timestep_embedding,
    with_sharding,
)


class CrossAttnDownBlock(nn.Module):
    out_channels: int
    layers: int
    heads: int
    head_dim: int
    use_linear_projection: bool
    transformer_depth: int
    norm_groups: int
    add_downsample: bool
    has_attn: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        skips = []
        for i in range(self.layers):
            x = ResnetBlock(self.out_channels, self.norm_groups, self.dtype,
                            name=f"resnets_{i}")(x, temb)
            if self.has_attn:
                x = Transformer2D(
                    self.heads, self.head_dim, self.transformer_depth,
                    self.use_linear_projection, self.norm_groups, self.dtype,
                    name=f"attentions_{i}",
                )(x, context)
            skips.append(x)
        if self.add_downsample:
            x = Downsample(self.out_channels, self.dtype, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class CrossAttnUpBlock(nn.Module):
    out_channels: int
    layers: int
    heads: int
    head_dim: int
    use_linear_projection: bool
    transformer_depth: int
    norm_groups: int
    add_upsample: bool
    has_attn: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, context):
        for i in range(self.layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock(self.out_channels, self.norm_groups, self.dtype,
                            name=f"resnets_{i}")(x, temb)
            if self.has_attn:
                x = Transformer2D(
                    self.heads, self.head_dim, self.transformer_depth,
                    self.use_linear_projection, self.norm_groups, self.dtype,
                    name=f"attentions_{i}",
                )(x, context)
        if self.add_upsample:
            x = Upsample(self.out_channels, self.dtype, name="upsamplers_0")(x)
        return x


class MidBlock(nn.Module):
    channels: int
    heads: int
    head_dim: int
    use_linear_projection: bool
    transformer_depth: int
    norm_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        x = ResnetBlock(self.channels, self.norm_groups, self.dtype,
                        name="resnets_0")(x, temb)
        x = Transformer2D(
            self.heads, self.head_dim, self.transformer_depth,
            self.use_linear_projection, self.norm_groups, self.dtype,
            name="attentions_0",
        )(x, context)
        x = ResnetBlock(self.channels, self.norm_groups, self.dtype,
                        name="resnets_1")(x, temb)
        return x


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents_nchw, timesteps, context, added_cond=None):
        """latents (B, C, h, w) NCHW; timesteps (B,) or scalar; context
        (B, seq, cross_attn_dim); added_cond (SDXL): dict with
        text_embeds (B, 1280) and time_ids (B, 6).  Returns output, NCHW."""
        cfg = self.config
        x = jnp.transpose(latents_nchw, (0, 2, 3, 1)).astype(self.dtype)
        x = with_sharding(x, ("dp", None, None, None))
        context = context.astype(self.dtype)

        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))
        temb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos,
            cfg.freq_shift,
        ).astype(self.dtype)
        temb = TimeEmbedding(cfg.block_out_channels[0] * 4, self.dtype,
                             name="time_embedding")(temb)

        if cfg.addition_embed_dim:
            # SDXL micro-conditioning: 256-dim sinusoidal features per
            # time_id, concat with pooled text embeds, project, add to temb.
            if added_cond is None:
                raise ValueError("SDXL config needs added_cond "
                                 "{text_embeds, time_ids}")
            tid = added_cond["time_ids"].reshape(-1)
            tid_emb = timestep_embedding(tid, 256, cfg.flip_sin_to_cos,
                                         cfg.freq_shift)
            tid_emb = tid_emb.reshape(x.shape[0], -1)
            add = jnp.concatenate(
                [added_cond["text_embeds"], tid_emb], axis=-1
            ).astype(self.dtype)
            temb = temb + TimeEmbedding(
                cfg.block_out_channels[0] * 4, self.dtype,
                name="add_embedding",
            )(add)

        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)

        skips = [x]
        n_levels = len(cfg.block_out_channels)
        for lvl, out_ch in enumerate(cfg.block_out_channels):
            x, s = CrossAttnDownBlock(
                out_channels=out_ch,
                layers=cfg.layers_per_block,
                heads=cfg.heads_for(out_ch),
                head_dim=out_ch // cfg.heads_for(out_ch),
                use_linear_projection=cfg.use_linear_projection,
                transformer_depth=cfg.depth_for(lvl),
                norm_groups=cfg.norm_groups,
                add_downsample=lvl < n_levels - 1,
                has_attn=cfg.cross_attn_levels[lvl],
                dtype=self.dtype,
                name=f"down_blocks_{lvl}",
            )(x, temb, context)
            skips.extend(s)

        mid_ch = cfg.block_out_channels[-1]
        x = MidBlock(
            channels=mid_ch,
            heads=cfg.heads_for(mid_ch),
            head_dim=mid_ch // cfg.heads_for(mid_ch),
            use_linear_projection=cfg.use_linear_projection,
            transformer_depth=cfg.depth_for(n_levels - 1),
            norm_groups=cfg.norm_groups,
            dtype=self.dtype,
            name="mid_block",
        )(x, temb, context)

        for up_idx, lvl in enumerate(reversed(range(n_levels))):
            out_ch = cfg.block_out_channels[lvl]
            x = CrossAttnUpBlock(
                out_channels=out_ch,
                layers=cfg.layers_per_block + 1,
                heads=cfg.heads_for(out_ch),
                head_dim=out_ch // cfg.heads_for(out_ch),
                use_linear_projection=cfg.use_linear_projection,
                transformer_depth=cfg.depth_for(lvl),
                norm_groups=cfg.norm_groups,
                add_upsample=lvl > 0,
                has_attn=cfg.cross_attn_levels[lvl],
                dtype=self.dtype,
                name=f"up_blocks_{up_idx}",
            )(x, skips, temb, context)

        x = GroupNorm32(cfg.norm_groups, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.sample_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        return jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)

    def init_params(self, rng, latent_hw=(8, 8), context_len=8):
        cfg = self.config
        h, w = latent_hw
        lat = jnp.zeros((1, cfg.sample_channels, h, w))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, context_len, cfg.cross_attn_dim))
        added = None
        if cfg.addition_embed_dim:
            pooled = cfg.addition_embed_dim - 6 * 256
            added = {"text_embeds": jnp.zeros((1, pooled)),
                     "time_ids": jnp.zeros((1, 6))}
        return self.init(rng, lat, t, ctx, added)
