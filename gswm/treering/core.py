"""Tree-Ring watermarking core (FFT-domain injection + detection).

API parity with the recovered optim_utils surface (SURVEY.md §2.3):
get_watermarking_mask (circle/square masks, w_radius/w_channel),
get_watermarking_pattern (seed_ring/zeros/rand/const/ring via
fftshift(fft2)), inject_watermark (ifft2(ifftshift)), eval_watermark (L1 in
FFT domain over the mask), get_p_value (noncentral chi-square tail).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _circle_mask(size: int, r: int) -> np.ndarray:
    y, x = np.ogrid[:size, :size]
    cy = cx = size // 2
    return ((x - cx) ** 2 + (y - cy) ** 2) <= r**2


def get_watermarking_mask(
    latents_shape: tuple, w_channel: int = 0, w_radius: int = 10,
    mask_shape: str = "circle",
) -> jnp.ndarray:
    """Boolean mask over (B, C, H, W) selecting the watermarked FFT region.

    w_channel = -1 watermarks every channel.
    """
    b, c, h, w = latents_shape
    mask = np.zeros(latents_shape, dtype=bool)
    if mask_shape == "circle":
        m = _circle_mask(h, w_radius)
    elif mask_shape == "square":
        m = np.zeros((h, w), dtype=bool)
        cy, cx = h // 2, w // 2
        m[cy - w_radius : cy + w_radius, cx - w_radius : cx + w_radius] = True
    elif mask_shape == "no":
        return jnp.asarray(mask)
    else:
        raise ValueError(mask_shape)
    if w_channel == -1:
        mask[:, :] = m
    else:
        mask[:, w_channel] = m
    return jnp.asarray(mask)


def get_watermarking_pattern(
    key: jax.Array, latents_shape: tuple, w_pattern: str = "ring",
    w_radius: int = 10,
) -> jnp.ndarray:
    """Complex FFT-domain pattern (B, C, H, W)."""
    b, c, h, w = latents_shape
    base = jax.random.normal(key, latents_shape)
    fft = jnp.fft.fftshift(jnp.fft.fft2(base), axes=(-1, -2))

    if w_pattern == "zeros":
        return jnp.zeros(latents_shape, jnp.complex64)
    if w_pattern == "const":
        return jnp.zeros(latents_shape, jnp.complex64) + 1.0
    if w_pattern == "rand":
        return fft
    if w_pattern in ("ring", "seed_ring"):
        # concentric rings: every FFT coefficient inside radius r takes the
        # constant drawn at that ring's edge, innermost ring last
        pattern = fft
        for r in range(w_radius, 0, -1):
            ring = jnp.asarray(_circle_mask(h, r))[None, None]
            val = fft[..., h // 2, h // 2 - r]  # (B, C)
            pattern = jnp.where(ring, val[..., None, None], pattern)
        return pattern
    raise ValueError(w_pattern)


def inject_watermark(latents: jnp.ndarray, mask: jnp.ndarray,
                     pattern: jnp.ndarray) -> jnp.ndarray:
    """Replace masked FFT coefficients with the pattern; return real latents
    (fft2 -> patch -> ifft2, optim_utils.inject_watermark semantics)."""
    fft = jnp.fft.fftshift(jnp.fft.fft2(latents.astype(jnp.complex64)),
                           axes=(-1, -2))
    fft = jnp.where(mask, pattern, fft)
    out = jnp.fft.ifft2(jnp.fft.ifftshift(fft, axes=(-1, -2)))
    return jnp.real(out).astype(jnp.float32)


def eval_watermark(reversed_latents: jnp.ndarray, pattern: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
    """Per-image L1 distance between recovered FFT and the pattern, over the
    mask (lower = watermarked)."""
    fft = jnp.fft.fftshift(jnp.fft.fft2(reversed_latents.astype(jnp.complex64)),
                           axes=(-1, -2))
    diff = jnp.abs(fft - pattern) * mask
    denom = jnp.maximum(mask.sum(axis=(1, 2, 3)), 1)
    return diff.sum(axis=(1, 2, 3)) / denom


def get_p_value(reversed_latents, pattern, mask) -> list[float]:
    """Detection p-value via the noncentral chi-square tail
    (optim_utils.get_p_value construction)."""
    from scipy.stats import ncx2

    fft = jnp.fft.fftshift(jnp.fft.fft2(jnp.asarray(reversed_latents,
                                                    jnp.complex64)),
                           axes=(-1, -2))
    ps = []
    m = np.asarray(mask)
    target = np.asarray(pattern)
    arr = np.asarray(fft)
    for i in range(arr.shape[0]):
        sel = m[i] if m.ndim == 4 else m
        obs = np.concatenate([arr[i].real[sel], arr[i].imag[sel]])
        tgt = np.concatenate([target[i].real[sel], target[i].imag[sel]])
        sigma = obs.std() + 1e-9
        lam = (tgt**2).sum() / sigma**2
        x = ((obs - tgt) ** 2).sum() / sigma**2
        ps.append(float(ncx2.cdf(x, df=obs.size, nc=lam)))
    return ps
