"""Fit a random-init VAE so encode approximately inverts decode.

Offline there are no real SD weights (the environment has no checkpoints),
and a *random* VAE destroys latents entirely — any image-space roundtrip
accuracy above chance would be seed luck.  A real SD VAE is near-lossless
for the posterior mean, so a few hundred Adam steps on
``encode(clip(decode(z))) ~= z`` put a tiny VAE in the same regime: closed
loops through image space (tests, robustness sweeps) then measure the
extraction chain (extract.py:31-43 + 46-70 equivalents), not luck.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def radial_logpsd(img, nbins: int = 16):
    """Per-image radial log power spectrum, ``nbins`` rings over spatial
    frequency (rfft2 over H,W; channels pooled).  Returns (B, nbins)."""
    import jax

    h, w = img.shape[-2:]
    f = jnp.fft.rfft2(img.astype(jnp.float32))
    p = jnp.abs(f) ** 2
    fy = jnp.fft.fftfreq(h)[:, None]
    fx = jnp.fft.rfftfreq(w)[None, :]
    r = jnp.sqrt(fy ** 2 + fx ** 2)
    idx = jnp.clip((r / r.max() * nbins).astype(jnp.int32), 0, nbins - 1)
    onehot = jax.nn.one_hot(idx, nbins, dtype=jnp.float32)
    psd = (jnp.einsum("bchw,hwn->bn", p, onehot)
           / (jnp.sum(onehot, axis=(0, 1)) + 1e-9) / img.shape[1])
    return jnp.log(psd + 1e-12)


def spectral_loss(img, alpha: float = 2.0, nbins: int = 16):
    """Shape mismatch between the decoded image's radial spectrum and the
    natural-image 1/f^alpha law (both mean-centered in log space, DC ring
    excluded — scale-free: only the ALLOCATION across bands is constrained).

    Purpose (VERDICT r4 next #5): the identity-only fit objective selects
    the smoothest information channel, so the fitted VAE parks watermark
    information below every value attack's cutoff and the robustness rows
    saturate at 1.000.  Real SD decoders emit natural-spectrum images; this
    term is that prior — independent of any attack, so a curve that moves
    under it is evidence, not circular fitting."""
    h, w = img.shape[-2:]
    fy = jnp.fft.fftfreq(h)
    fx = jnp.fft.rfftfreq(w)
    r = jnp.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)
    # ring-center radii for the target law (same bucketing as radial_logpsd)
    idx = jnp.clip((r / r.max() * nbins).astype(jnp.int32), 0, nbins - 1)
    centers = jnp.array([
        jnp.where(idx == n, r, 0.0).sum() / jnp.maximum(
            (idx == n).sum(), 1) for n in range(nbins)])
    target = -alpha * jnp.log(centers[1:] + 1e-12)
    target = target - target.mean()
    logpsd = radial_logpsd(img, nbins)[:, 1:]
    logpsd = logpsd - logpsd.mean(axis=1, keepdims=True)
    return jnp.mean((logpsd - target[None, :]) ** 2)


def fit_vae_roundtrip(pipe, scale_range=(8.0, 18.0), steps: int = 600,
                      batch: int = 16, lr: float = 1e-3, rng=None,
                      latent_hw=(8, 8), spectral: float = 0.0):
    """Train ``pipe.vae_params`` in place so encode inverts decode at the
    latent scales the pipeline actually produces.

    ``scale_range`` matters: a random epsilon-UNet's DDIM trajectory
    telescopes x0 ~ x_T / sqrt(alpha_T) ~ 14x the unit-Gaussian scale (real
    UNets cancel the noise; random ones do not), so the fit must cover that
    regime for closed-loop runs.  Returns the pipe.

    Trace-time caveat (same contract as the GSWM_ATTN_* knobs): this sets
    GSWM_VAE_ATTN/GSWM_VAE_REMAT for the duration of the fit, and those are
    read when a VAE apply is TRACED, not when it runs — any *unrelated* VAE
    apply first traced inside the fit window (same process, same shapes)
    caches the chunked/remat trace and keeps serving it after the env is
    restored.  Run the fit before tracing, or in its own process.
    """
    import os

    import optax

    # The pallas flash kernel in the VAE mid-block has no working autodiff
    # rule; the chunked exact-attention mode is differentiable and memory-
    # bounded (O(S*chunk) logits), so grads work at 96x96+/128x128 latent
    # fit stages.  Env read at TRACE time inside VAEAttention, so setting it
    # here covers the jitted step below; restored after the fit.
    prev_vae_attn = os.environ.get("GSWM_VAE_ATTN")
    os.environ["GSWM_VAE_ATTN"] = "chunked"
    # Per-block remat inside the flat decode/encode checkpoints below:
    # without it the backward at 768px+ images materializes every up-block
    # temporary at once (83G vs 15.75G HBM, runbook r4b2 fit_probe).
    prev_vae_remat = os.environ.get("GSWM_VAE_REMAT")
    os.environ["GSWM_VAE_REMAT"] = "block"

    from gswm.models.vae import AutoencoderKL

    vae = pipe.vae
    c = pipe.preset.vae.latent_channels

    # jax.checkpoint (remat) around each VAE half: backward recomputes the
    # conv stack instead of storing every intermediate — at full-size
    # (83.7M-param VAE, 512px images) the stored-activation footprint
    # otherwise RESOURCE_EXHAUSTs a 16GB chip even at batch 8.
    dec = jax.checkpoint(
        lambda p, zz: vae.apply(p, zz, method=AutoencoderKL.decode))
    enc = jax.checkpoint(
        lambda p, ii: vae.apply(p, ii, method=AutoencoderKL.encode))

    def loss_fn(params, z, scale):
        img = jnp.clip(dec(params, z), -1.0, 1.0)  # generate() clips images
        z_back = enc(params, img)
        loss = jnp.mean(((z_back - z) / scale) ** 2)
        if spectral > 0.0:
            loss = loss + spectral * spectral_loss(img)
        return loss

    opt = optax.adam(lr)
    params = pipe.vae_params
    state = opt.init(params)

    @jax.jit
    def step(params, state, z, scale):
        loss, g = jax.value_and_grad(loss_fn)(params, z, scale)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, loss

    rng = rng if rng is not None else jax.random.key(42)
    h, w = latent_hw
    try:
        for _ in range(steps):
            rng, kz, ks = jax.random.split(rng, 3)
            scale = jax.random.uniform(ks, (batch, 1, 1, 1),
                                       minval=scale_range[0],
                                       maxval=scale_range[1])
            z = scale * jax.random.normal(kz, (batch, c, h, w))
            params, state, _ = step(params, state, z, scale)
    finally:
        if prev_vae_attn is None:
            os.environ.pop("GSWM_VAE_ATTN", None)
        else:
            os.environ["GSWM_VAE_ATTN"] = prev_vae_attn
        if prev_vae_remat is None:
            os.environ.pop("GSWM_VAE_REMAT", None)
        else:
            os.environ["GSWM_VAE_REMAT"] = prev_vae_remat
    pipe.vae_params = params
    return pipe
