"""AutoencoderKL — VAE encoder/decoder (Flax linen, NHWC).

The extraction path needs only the encoder's *posterior mean* — the reference
deliberately uses ``posterior.mean * 0.18215``, never a sample
(extract.py:39-43; SURVEY.md §7.3 flags this as an easy-to-get-wrong detail).
``encode_moments`` returns (mean, logvar); ``encode`` returns the scaled mean.
Public tensors are NCHW to match the reference convention.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from gswm.models.configs import VAEConfig
from gswm.models.layers import (
    Downsample,
    GroupNorm32,
    ResnetBlock,
    Upsample,
    VAEAttention,
)


class EncoderBlock(nn.Module):
    out_channels: int
    layers: int
    norm_groups: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            x = ResnetBlock(self.out_channels, self.norm_groups, self.dtype,
                            use_time_emb=False, norm_eps=1e-6,
                            name=f"resnets_{i}")(x)
        if self.add_downsample:
            # diffusers VAE encoder: asymmetric (0,1,0,1) pad + VALID conv
            x = Downsample(self.out_channels, self.dtype, asymmetric_pad=True,
                           name="downsamplers_0")(x)
        return x


class DecoderBlock(nn.Module):
    out_channels: int
    layers: int
    norm_groups: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            x = ResnetBlock(self.out_channels, self.norm_groups, self.dtype,
                            use_time_emb=False, norm_eps=1e-6,
                            name=f"resnets_{i}")(x)
        if self.add_upsample:
            x = Upsample(self.out_channels, self.dtype, name="upsamplers_0")(x)
        return x


class VAEMid(nn.Module):
    channels: int
    norm_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.channels, self.norm_groups, self.dtype,
                        use_time_emb=False, norm_eps=1e-6, name="resnets_0")(x)
        x = VAEAttention(self.norm_groups, self.dtype, name="attentions_0")(x)
        x = ResnetBlock(self.channels, self.norm_groups, self.dtype,
                        use_time_emb=False, norm_eps=1e-6, name="resnets_1")(x)
        return x


def _maybe_remat(cls):
    """GSWM_VAE_REMAT=block: checkpoint each encoder/decoder block, so a
    grad through the VAE stores only block-boundary activations and
    re-materializes one block's internals at a time.  The flat
    jax.checkpoint around the whole decode (gswm.utils.fitting) is NOT
    enough at 768px+: its backward materializes every up-block temporary at
    once — the 96x96-latent fit stage OOM'd the compiler at 83G vs 15.75G
    HBM (runbook r4b2 fit_probe).  Param structure is unchanged (nn.remat
    is transparent to module paths); forward-only inference is unaffected."""
    if os.environ.get("GSWM_VAE_REMAT") == "block":
        return nn.remat(cls)
    return cls


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            x = _maybe_remat(EncoderBlock)(
                ch, cfg.layers_per_block, cfg.norm_groups,
                add_downsample=i < n - 1, dtype=self.dtype,
                name=f"down_blocks_{i}")(x)
        x = _maybe_remat(VAEMid)(cfg.block_out_channels[-1], cfg.norm_groups,
                                 self.dtype, name="mid_block")(x)
        x = GroupNorm32(cfg.norm_groups, epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        rev = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        x = _maybe_remat(VAEMid)(rev[0], cfg.norm_groups, self.dtype,
                                 name="mid_block")(x)
        n = len(rev)
        for i, ch in enumerate(rev):
            x = _maybe_remat(DecoderBlock)(
                ch, cfg.layers_per_block + 1, cfg.norm_groups,
                add_upsample=i < n - 1, dtype=self.dtype,
                name=f"up_blocks_{i}")(x)
        x = GroupNorm32(cfg.norm_groups, epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(x)


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype)

    def encode_moments(self, images_nchw):
        """images (B, 3, H, W) in [-1, 1] -> (mean, logvar), each
        (B, latent_channels, H/8, W/8)."""
        x = jnp.transpose(images_nchw, (0, 2, 3, 1)).astype(self.dtype)
        h = self.encoder(x)
        h = self.quant_conv(h)
        h = jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)
        mean, logvar = jnp.split(h, 2, axis=1)
        return mean, logvar

    def encode(self, images_nchw):
        """Posterior MEAN scaled by the SD factor (extract.py:42 parity)."""
        mean, _ = self.encode_moments(images_nchw)
        return mean * self.config.scaling_factor

    def decode(self, latents_nchw):
        """Scaled latents -> images (B, 3, H, W) in [-1, 1]."""
        z = latents_nchw / self.config.scaling_factor
        z = jnp.transpose(z, (0, 2, 3, 1)).astype(self.dtype)
        z = self.post_quant_conv(z)
        x = self.decoder(z)
        return jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)

    def __call__(self, images_nchw):
        """Encode-decode roundtrip through the posterior mean (init helper)."""
        return self.decode(self.encode(images_nchw))
