"""Batched on-device attacks (jnp, jit-friendly, NCHW float images in [0,1]).

TPU counterparts of the host/PIL attacks so whole robustness sweeps run
without leaving the device (SURVEY.md §2.4 "distortion bench as batched TPU
ops").  JPEG is a DCT-quantization round trip — the standard differentiable
approximation; report-grade numbers use the exact host path.

Every function takes and returns (B, 3, H, W) float32 and is shaped for
``jax.jit``; randomized attacks take an explicit PRNG key.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# -- elementwise ------------------------------------------------------------


def noise(x, key, std):
    return jnp.clip(x + std * jax.random.normal(key, x.shape), 0.0, 1.0)


def brightness(x, factor):
    """PIL ImageEnhance.Brightness: blend with black."""
    return jnp.clip(x * factor, 0.0, 1.0)


def contrast(x, factor):
    """PIL ImageEnhance.Contrast: blend with the mean luminance."""
    luma = (
        0.299 * x[:, 0:1] + 0.587 * x[:, 1:2] + 0.114 * x[:, 2:3]
    ).mean(axis=(2, 3), keepdims=True)
    return jnp.clip(luma + factor * (x - luma), 0.0, 1.0)


def invert(x):
    return 1.0 - x


def togray(x):
    luma = 0.299 * x[:, 0:1] + 0.587 * x[:, 1:2] + 0.114 * x[:, 2:3]
    return jnp.broadcast_to(luma, x.shape)


def horizontal_flip(x):
    return x[..., ::-1]


def vertical_flip(x):
    return x[..., ::-1, :]


# -- geometric ---------------------------------------------------------------


def _bilinear_gather(x, sy, sx):
    """Sample (B,C,H,W) at float coords sy/sx (H,W) with bilinear filtering."""
    h, w = x.shape[-2:]
    sy = jnp.clip(sy, 0.0, h - 1.0)
    sx = jnp.clip(sx, 0.0, w - 1.0)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = sy - y0
    wx = sx - x0
    g = lambda yy, xx: x[..., yy, xx]
    out = (
        g(y0, x0) * (1 - wy) * (1 - wx)
        + g(y1, x0) * wy * (1 - wx)
        + g(y0, x1) * (1 - wy) * wx
        + g(y1, x1) * wy * wx
    )
    return out


def rotation(x, angle_degrees):
    """Rotate about the center, zero-fill outside (F.rotate semantics)."""
    h, w = x.shape[-2:]
    theta = jnp.deg2rad(angle_degrees)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    c, s = jnp.cos(theta), jnp.sin(theta)
    sy = cy + (yy - cy) * c - (xx - cx) * s
    sx = cx + (yy - cy) * s + (xx - cx) * c
    inside = (sy >= 0) & (sy <= h - 1) & (sx >= 0) & (sx <= w - 1)
    out = _bilinear_gather(x, sy, sx)
    return out * inside.astype(x.dtype)


def scaling(x, scale: float):
    """LANCZOS-ish resize to scale (device path uses cubic)."""
    b, c, h, w = x.shape
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    return jax.image.resize(x, (b, c, nh, nw), method="cubic")


def resizedcrop(x, key, scale):
    """Random square area-crop then resize back (RandomResizedCrop
    scale=(s,s), ratio=(1,1))."""
    b, c, h, w = x.shape
    side_f = jnp.sqrt(scale * h * w)
    side = jnp.minimum(jnp.floor(side_f), jnp.float32(min(h, w)))
    ki, kj = jax.random.split(key)
    i = jax.random.uniform(ki, ()) * (h - side)
    j = jax.random.uniform(kj, ()) * (w - side)
    yy = i + jnp.arange(h, dtype=jnp.float32) * (side - 1) / (h - 1)
    xx = j + jnp.arange(w, dtype=jnp.float32) * (side - 1) / (w - 1)
    sy, sx = jnp.meshgrid(yy, xx, indexing="ij")
    return _bilinear_gather(x, sy, sx)


def _rect_mask(shape_hw, i, j, hh, ww):
    h, w = shape_hw
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    return ((yy >= i) & (yy < i + hh) & (xx >= j) & (xx < j + ww))


def erasing(x, key, scale):
    """Zero a random square of area-fraction ``scale``."""
    b, c, h, w = x.shape
    side = jnp.minimum(jnp.floor(jnp.sqrt(scale * h * w)), jnp.float32(min(h, w)))
    ki, kj = jax.random.split(key)
    i = jnp.floor(jax.random.uniform(ki, ()) * (h - side))
    j = jnp.floor(jax.random.uniform(kj, ()) * (w - side))
    mask = _rect_mask((h, w), i, j, side, side)
    return x * (1.0 - mask.astype(x.dtype))


def randomcrop(x, key, scale):
    """Keep a random square of area-fraction ``scale``, zero the rest
    (crop + black repaste, `distortions`:207-222)."""
    b, c, h, w = x.shape
    side = jnp.minimum(jnp.floor(jnp.sqrt(scale * h * w)), jnp.float32(min(h, w)))
    ki, kj = jax.random.split(key)
    i = jnp.floor(jax.random.uniform(ki, ()) * (h - side))
    j = jnp.floor(jax.random.uniform(kj, ()) * (w - side))
    mask = _rect_mask((h, w), i, j, side, side)
    return x * mask.astype(x.dtype)


def blurring(x, kernel_size):
    """Gaussian blur, PIL convention: radius = kernel_size, sigma ~ radius."""
    k = int(kernel_size)
    if k <= 0:
        return x
    sigma = max(float(k), 1e-3)
    half = int(3 * sigma)
    ax = jnp.arange(-half, half + 1, dtype=jnp.float32)
    g = jnp.exp(-(ax**2) / (2 * sigma**2))
    g = g / g.sum()
    b, c, h, w = x.shape
    xr = x.reshape(b * c, 1, h, w)
    kh = g.reshape(1, 1, -1, 1)
    kw = g.reshape(1, 1, 1, -1)
    pad_h = [(0, 0), (0, 0), (half, half), (0, 0)]
    pad_w = [(0, 0), (0, 0), (0, 0), (half, half)]
    xr = jnp.pad(xr, pad_h, mode="edge")
    xr = jax.lax.conv_general_dilated(xr, kh, (1, 1), "VALID",
                                      dimension_numbers=("NCHW", "OIHW", "NCHW"))
    xr = jnp.pad(xr, pad_w, mode="edge")
    xr = jax.lax.conv_general_dilated(xr, kw, (1, 1), "VALID",
                                      dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return xr.reshape(b, c, h, w)


def elastic(x, key, alpha, sigma_rel=0.02):
    """Smooth random displacement field of magnitude alpha pixels."""
    b, c, h, w = x.shape
    sigma = max(sigma_rel * max(h, w), 1.0)
    kd, kx = jax.random.split(key)
    dy = jax.random.uniform(kd, (h, w)) * 2 - 1
    dx = jax.random.uniform(kx, (h, w)) * 2 - 1

    half = int(3 * sigma)
    ax = jnp.arange(-half, half + 1, dtype=jnp.float32)
    g = jnp.exp(-(ax**2) / (2 * sigma**2))
    g = g / g.sum()

    def smooth(f):
        f = f[None, None]
        f = jnp.pad(f, [(0, 0), (0, 0), (half, half), (0, 0)], mode="edge")
        f = jax.lax.conv_general_dilated(f, g.reshape(1, 1, -1, 1), (1, 1),
                                         "VALID",
                                         dimension_numbers=("NCHW", "OIHW", "NCHW"))
        f = jnp.pad(f, [(0, 0), (0, 0), (0, 0), (half, half)], mode="edge")
        f = jax.lax.conv_general_dilated(f, g.reshape(1, 1, 1, -1), (1, 1),
                                         "VALID",
                                         dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return f[0, 0]

    dy = smooth(dy) * alpha
    dx = smooth(dx) * alpha
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return _bilinear_gather(x, yy + dy, xx + dx)


# -- JPEG (DCT round trip) ---------------------------------------------------

_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)
_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float32,
)


def _quality_scale(quality: int) -> float:
    q = min(max(int(quality), 1), 100)
    return 5000.0 / q if q < 50 else 200.0 - 2.0 * q


def _quant_tables(quality: int):
    s = _quality_scale(quality)
    ql = np.clip(np.floor((_Q_LUMA * s + 50) / 100), 1, 255)
    qc = np.clip(np.floor((_Q_CHROMA * s + 50) / 100), 1, 255)
    return jnp.asarray(ql), jnp.asarray(qc)


@functools.lru_cache(maxsize=1)
def _dct_mat():
    k = np.arange(8)
    n = np.arange(8)
    m = np.sqrt(2.0 / 8.0) * np.cos((2 * n[None, :] + 1) * k[:, None] * np.pi / 16)
    m[0] /= np.sqrt(2.0)
    return jnp.asarray(m, dtype=jnp.float32)


def _blockwise(x, fn):
    """x: (..., H, W) -> apply fn on 8x8 blocks."""
    h, w = x.shape[-2:]
    ph, pw = (-h) % 8, (-w) % 8
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)], mode="edge")
    hh, ww = x.shape[-2], x.shape[-1]
    x = x.reshape(x.shape[:-2] + (hh // 8, 8, ww // 8, 8))
    x = jnp.swapaxes(x, -3, -2)  # (..., hb, wb, 8, 8)
    x = fn(x)
    x = jnp.swapaxes(x, -3, -2).reshape(x.shape[:-4] + (hh, ww))
    return x[..., :h, :w]


def jpeg_compress(x, quality: int):
    """DCT-quantization JPEG round trip, 4:4:4, device-resident."""
    ql, qc = _quant_tables(quality)
    d = _dct_mat()

    r, g, b = x[:, 0], x[:, 1], x[:, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 0.5
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5

    def roundtrip(chan, q):
        def fn(blocks):
            c = (blocks - 0.5) * 255.0
            coef = jnp.einsum("ij,...jk,lk->...il", d, c, d)
            coef = jnp.round(coef / q) * q
            rec = jnp.einsum("ji,...jk,kl->...il", d, coef, d)
            return rec / 255.0 + 0.5

        return _blockwise(chan, fn)

    y = roundtrip(y, ql)
    cb = roundtrip(cb, qc)
    cr = roundtrip(cr, qc)

    cb = cb - 0.5
    cr = cr - 0.5
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return jnp.clip(jnp.stack([r, g, b], axis=1), 0.0, 1.0)


# -- dispatch ----------------------------------------------------------------


def apply(x, distortion_type: str, strength, key=None):
    """Batched device dispatch mirroring the host table.  ``strength`` is
    ABSOLUTE (callers convert with relative_strength_to_absolute)."""
    key = key if key is not None else jax.random.key(0)
    if distortion_type == "rotation":
        return rotation(x, strength)
    if distortion_type == "scaling":
        return scaling(x, float(strength))
    if distortion_type == "resizedcrop":
        return resizedcrop(x, key, strength)
    if distortion_type == "erasing":
        return erasing(x, key, strength)
    if distortion_type == "brightness":
        return brightness(x, strength)
    if distortion_type == "contrast":
        return contrast(x, strength)
    if distortion_type == "blurring":
        return blurring(x, strength)
    if distortion_type == "noise":
        return noise(x, key, strength)
    if distortion_type == "compression":
        return jpeg_compress(x, int(strength))
    if distortion_type == "elastic":
        return elastic(x, key, strength)
    if distortion_type == "togray":
        return togray(x)
    if distortion_type == "horizontal_flip":
        return horizontal_flip(x)
    if distortion_type == "vertical_flip":
        return vertical_flip(x)
    if distortion_type == "randomcrop":
        return randomcrop(x, key, strength)
    if distortion_type == "invert":
        return invert(x)
    raise ValueError(distortion_type)
