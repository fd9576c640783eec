"""InversablePipeline — txt2img(Z_T) -> image and invert(image) -> Z_T.

Equivalent capability to the reference's extraction stack (extract.py:46-70)
plus its compiled-only InversableStableDiffusionPipeline (SURVEY.md §2.3),
designed TPU-first:

  * the whole denoise / inversion loop is ONE ``lax.scan`` under ``jit`` —
    static shapes, no per-step Python;
  * jit cache keyed on (shape, steps, scheduler, guidance-mode, refine), so a
    10k-image sweep compiles once (the reference re-builds the pipeline per
    image, extract.py:56-60);
  * classifier-free guidance batches cond/uncond through the UNet in one
    call; guidance == 1.0 (the inversion setting, extract.py:66) skips the
    double compute entirely;
  * scheduler state is fp32 even when the UNet computes in bf16
    (SURVEY.md §7.3);
  * optional fixed-point refinement of each inversion step (AIDI/EasyInv
    style, PAPERS.md): re-evaluate eps at the *target* timestep on the
    current x_{t+1} estimate — measurably tightens Z_T recovery for +K UNet
    evals per step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gswm.models.configs import ModelPreset, PRESETS
from gswm.models.text import TextEncoder
from gswm.models.unet import UNet2DCondition
from gswm.models.vae import AutoencoderKL
from gswm.schedulers import SCHEDULERS, sd_schedule
from gswm.schedulers.ddim import ddim_step, to_eps
from gswm.schedulers.dpm import dpm_init_carry, dpm_step


def _cast_floating(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


@dataclasses.dataclass
class PipelineOutput:
    """Generation result carrying the init noise — API parity with the
    reference's compiled-only ModifiedStableDiffusionPipelineOutput
    (images, nsfw_content_detected, init_latents; SURVEY.md §2.3), which
    exists precisely so embed/extract roundtrips can be verified without
    touching the filesystem."""

    images: jax.Array  # (B, 3, H, W) in [0, 1]
    nsfw_content_detected: list
    init_latents: jax.Array  # the Z_T that seeded generation


class InversablePipeline:
    """One weight set; generate and invert; jit-cached per static config."""

    def __init__(
        self,
        preset: ModelPreset | str = "sd-2-1-base",
        model_dir: Optional[str] = None,
        dtype=jnp.bfloat16,
        weights_dtype=None,
        rng: Optional[jax.Array] = None,
    ):
        """``dtype`` is the compute dtype; ``weights_dtype`` optionally casts
        the UNet/VAE params once at load (bf16 halves weight HBM traffic in
        the scan — the reference itself runs fp16 weights, extract.py:48)."""
        if isinstance(preset, str):
            preset = PRESETS[preset]
        self.preset = preset
        self.dtype = dtype
        self.unet = UNet2DCondition(preset.unet, dtype=dtype)
        self.vae = AutoencoderKL(preset.vae, dtype=dtype)
        self.text = TextEncoder(preset.text)
        # SDXL: second (bigG) encoder; contexts concatenate on the feature dim
        self.text2 = TextEncoder(preset.text2) if preset.text2 else None
        self.schedule = sd_schedule(prediction_type=preset.prediction_type)

        rng = rng if rng is not None else jax.random.key(0)
        ru, rv = jax.random.split(rng)
        if model_dir is not None:
            from gswm.models import loader

            self.unet_params = loader.load_unet_params(model_dir)
            self.vae_params = loader.load_vae_params(model_dir)
            self.text_params = loader.load_text_params(model_dir)
            if self.text2 is not None:
                # SDXL second encoder + its text_projection (feeds the
                # pooled added_cond path)
                self.text2_params, self.text2_projection = (
                    loader.load_text2_params(model_dir))
        else:
            # random init — architecture-true; real weights attach when a
            # local checkpoint directory is available (offline environment).
            self.unet_params = self.unet.init_params(
                ru, context_len=preset.text.max_length
            )
            img = jnp.zeros((1, preset.vae.in_channels, 32, 32))
            self.vae_params = self.vae.init(rv, img)
            self.text_params = self.text.params

        if weights_dtype is None and jax.default_backend() == "tpu":
            # Auto residency policy (VERDICT r2 #8): keep fp32 master weights
            # (measured faster at SD2.1 scale) unless the fp32 tree itself
            # crowds activations out of HBM (SDXL: 10.3GB fp32 params on a
            # 16GB chip).  Explicit weights_dtype always wins.
            from gswm.utils.memory import suggest_weights_dtype

            param_bytes = sum(
                x.size * 4
                for t in (self.unet_params, self.vae_params)
                for x in jax.tree.leaves(t)
                if jnp.issubdtype(x.dtype, jnp.floating)
            )
            weights_dtype = suggest_weights_dtype(param_bytes)
        if weights_dtype is not None:
            # Donated jit: XLA frees each fp32 source buffer as its low-
            # precision copy is produced, so peak HBM stays near the OLD
            # tree size instead of old+new (SDXL: 10.3GB fp32 + 5.2GB bf16
            # = 15.5GB transient would OOM a 16GB chip before the first
            # forward pass).
            cast = jax.jit(
                functools.partial(_cast_floating, dtype=weights_dtype),
                donate_argnums=0,
            )
            self.unet_params = cast(self.unet_params)
            self.vae_params = cast(self.vae_params)

    # -- conditioning --------------------------------------------------------

    def encode_prompt_ids(self, input_ids, input_ids2=None) -> jax.Array:
        """(B, 77) token ids -> (B, 77, dim) context (concat of both
        encoders' hidden states for SDXL presets)."""
        h = self.text(jnp.asarray(input_ids), self.text_params)
        if self.text2 is not None:
            ids2 = input_ids if input_ids2 is None else input_ids2
            h2 = self.text2(jnp.asarray(ids2),
                            params=getattr(self, "text2_params", None))
            h = jnp.concatenate([h, h2], axis=-1)
        return h

    def empty_context(self, batch: int = 1) -> jax.Array:
        """Context for the empty prompt, broadcast to ``batch`` rows.

        Encoded ONCE per pipeline (all rows are the same "" prompt — the
        extraction setting, extract.py:66): the 340M-param text encoder
        otherwise re-runs on `batch` identical sequences every invert()
        call."""
        if getattr(self, "_empty_ctx", None) is None:
            self._empty_ctx = self.encode_prompt_ids(
                self.text.empty_prompt_ids(1))
        c = self._empty_ctx
        return jnp.broadcast_to(c, (batch,) + c.shape[1:])

    def pooled_empty_text(self, batch: int = 1) -> jax.Array:
        """SDXL pooled conditioning for the empty prompt: the second
        (OpenCLIP) encoder's pooled output on "", encoded once and broadcast.
        The real SDXL pipeline feeds THIS (not zeros) as
        added_cond_kwargs["text_embeds"] when the prompt is empty — the
        inversion path's setting (extract.py:66-69 analog)."""
        if getattr(self, "_empty_pooled", None) is None:
            enc = self.text2 if self.text2 is not None else self.text
            self._empty_pooled = enc.pooled(
                jnp.asarray(enc.empty_prompt_ids(1)),
                params=getattr(self, "text2_params", None),
                projection=getattr(self, "text2_projection", None),
            )
        p = self._empty_pooled
        return jnp.broadcast_to(p, (batch,) + p.shape[1:])

    def default_added_cond(self, batch: int, height: int, width: int,
                           pooled_text=None):
        """SDXL micro-conditioning defaults: time_ids = (orig_h, orig_w,
        crop 0, 0, target_h, target_w); pooled text embeds default to the
        second encoder's pooled output of the EMPTY prompt (what the real
        pipeline conditions on at guidance 1.0), overridable by the
        caller."""
        if not self.preset.unet.addition_embed_dim:
            return None
        if pooled_text is None:
            pooled_text = self.pooled_empty_text(batch)
        tid = jnp.asarray([[height, width, 0, 0, height, width]], jnp.float32)
        return {"text_embeds": pooled_text,
                "time_ids": jnp.broadcast_to(tid, (batch, 6))}

    # -- core scans ----------------------------------------------------------

    @functools.partial(
        jax.jit,
        static_argnames=("self", "num_steps", "scheduler", "guidance_mode",
                         "invert", "refine"),
    )
    def _run(
        self,
        unet_params,
        latents,
        context,
        uncond_context,
        guidance_scale,
        num_steps: int,
        scheduler: str = "DDIM",
        guidance_mode: bool = False,
        invert: bool = False,
        refine: int = 0,
        added_cond=None,
    ):
        plan_fn = SCHEDULERS[scheduler][1 if invert else 0]
        plan = plan_fn(self.schedule, num_steps)
        pred_type = self.schedule.prediction_type
        use_dpm = scheduler == "DPMs"

        if guidance_mode:
            ctx = jnp.concatenate([uncond_context, context], axis=0)
            added = (
                None if added_cond is None
                else jax.tree.map(
                    lambda a: jnp.concatenate([a, a], axis=0), added_cond
                )
            )
        else:
            ctx = context
            added = added_cond

        def eval_eps(x, t, a_eval):
            if guidance_mode:
                model_in = jnp.concatenate([x, x], axis=0)
                out = self.unet.apply(unet_params, model_in, t, ctx, added)
                out_u, out_c = jnp.split(out, 2, axis=0)
                out = out_u + guidance_scale * (out_c - out_u)
            else:
                out = self.unet.apply(unet_params, x, t, ctx, added)
            return to_eps(x, out, a_eval, pred_type)

        def body(carry, per_step):
            x, dpm_carry = carry
            if use_dpm:
                t, a_eval, a_from, a_to, first = per_step
            else:
                t, a_eval, a_from, a_to = per_step
            # Each refine iteration must re-take THIS step from the same
            # pre-step state: feeding an updated carry back into dpm_step
            # makes prev_lambda == lam_s (r0 == 0 -> guard substitutes 1.0)
            # and injects a spurious second-order term.
            carry_in = dpm_carry
            eps = eval_eps(x, t, a_eval)
            if use_dpm:
                x_next, new_carry = dpm_step(x, eps, a_from, a_to, carry_in,
                                             first)
            else:
                x_next = ddim_step(x, eps, a_from, a_to)
                new_carry = dpm_carry
            # fixed-point refinement (inversion only): eps at the target
            # timestep, re-estimated on the current x_next iterate.
            for _ in range(refine if invert else 0):
                eps = eval_eps(x_next, t, a_eval)
                if use_dpm:
                    x_next, new_carry = dpm_step(x, eps, a_from, a_to,
                                                 carry_in, first)
                else:
                    x_next = ddim_step(x, eps, a_from, a_to)
            return (x_next, new_carry), None

        xs = (plan.t_model, plan.alpha_eval, plan.alpha_from, plan.alpha_to)
        if use_dpm:
            xs = xs + (plan.extras["first_order"],)
        init = (latents.astype(jnp.float32), dpm_init_carry(latents.shape))
        (out, _), _ = jax.lax.scan(body, init, xs)
        return out

    # -- public API ----------------------------------------------------------

    def generate(
        self,
        latents,
        context=None,
        prompt_ids=None,
        guidance_scale: float = 7.5,
        num_steps: int = 50,
        scheduler: str = "DDIM",
        decode: bool = True,
    ):
        """Watermarked Z_T -> final latents (and images in [0,1] if decode).

        Mirrors the embed-side host samplers the reference plugs into
        (README.md:107-129, nodes.py:159-161) with the noise ALWAYS caller
        provided — that is the watermark contract.
        """
        b = latents.shape[0]
        if context is None:
            context = (
                self.encode_prompt_ids(prompt_ids)
                if prompt_ids is not None
                else self.empty_context(b)
            )
        guidance_mode = guidance_scale is not None and guidance_scale != 1.0
        uncond = self.empty_context(b) if guidance_mode else context
        f = 2 ** (len(self.preset.vae.block_out_channels) - 1)
        added = self.default_added_cond(b, latents.shape[-2] * f,
                                        latents.shape[-1] * f)
        out = self._run(
            self.unet_params,
            jnp.asarray(latents),
            context,
            uncond,
            jnp.float32(guidance_scale or 1.0),
            num_steps=num_steps,
            scheduler=scheduler,
            guidance_mode=guidance_mode,
            invert=False,
            added_cond=added,
        )
        if not decode:
            return out
        img = self._vae_chunked(out, AutoencoderKL.decode)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

    # VAE activations at 512x512 are the memory peak of the extraction path
    # (first encoder block: B*512*512*128 floats); chunking the batch keeps
    # HBM flat while the UNet loop still sees the full batch.  Chunk 32
    # measured 7.24 ms/img vs 10.15 at chunk 8 (v5e, 512x512); the budget
    # scales inversely with pixel count (chunk 32 at 768x768 = 4.8GB of
    # first-block activations alone — OOMs a 16GB chip).
    vae_chunk: int = 32

    def _vae_chunk_for(self, x) -> int:
        hw = x.shape[-2] * x.shape[-1]
        decode = x.shape[1] == self.preset.vae.latent_channels
        if decode:
            # decode path: activations blow up to image size at the output
            f = 2 ** (len(self.preset.vae.block_out_channels) - 1)
            hw *= f * f
        scale = max(1.0, hw / (512 * 512))
        if decode:
            # The decoder's up-block temporaries are fp32 NHWC and the
            # GroupNorm NCHW-copy stats hold ~2 extra copies of each
            # ((B,1024,1024,128) = 1.07GB per copy at batch 1): batch-8
            # decode at 768px OOM'd under a 4x factor's chunk-2 (runbook
            # r4b2 sweep768) and batch-2 decode at 1024px OOM'd even at
            # chunk 2 (r4e) — decode takes an 8x factor with a floor of 1.
            scale *= 8.0
        return max(1, int(self.vae_chunk / scale))

    def _vae_chunked(self, x, method):
        return self._vae_chunked_with(self.vae_params, x, method)

    def _vae_chunked_with(self, vae_params, x, method):
        b = x.shape[0]
        c = self._vae_chunk_for(x)
        if b <= c:
            return self.vae.apply(vae_params, x, method=method)
        pad = (-b) % c
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        xs = x.reshape(-1, c, *x.shape[1:])
        out = jax.lax.map(
            lambda ch: self.vae.apply(vae_params, ch, method=method), xs
        )
        out = out.reshape(-1, *out.shape[2:])
        return out[:b]

    @functools.partial(jax.jit, static_argnames=("self",))
    def _encode_jit(self, vae_params, images) -> jax.Array:
        # One dispatch for normalize + pad + chunked encode + slice: each
        # eager op between jits costs ~30 ms of RPC on the tunneled runtime
        # (docs/BENCH.md round-3 wall-minus-device budget).
        x = 2.0 * images.astype(jnp.float32) - 1.0
        return self._vae_chunked_with(vae_params, x, AutoencoderKL.encode)

    def image_to_latents(self, images) -> jax.Array:
        """images (B,3,H,W) in [0,1] -> scaled posterior-MEAN latents
        (extract.py:39-43 parity, including the 2x-1 normalization)."""
        return self._encode_jit(self.vae_params, jnp.asarray(images))

    def invert(
        self,
        images=None,
        latents=None,
        num_steps: int = 50,
        scheduler: str = "DDIM",
        refine: int = 0,
    ) -> jax.Array:
        """image (or its latents) -> recovered Z_T.

        Empty prompt, guidance 1.0 — the reference's extraction setting
        (extract.py:66-69).  ``refine`` adds fixed-point iterations per step.
        """
        if latents is None:
            latents = self.image_to_latents(images)
        b = latents.shape[0]
        ctx = self.empty_context(b)
        f = 2 ** (len(self.preset.vae.block_out_channels) - 1)
        added = self.default_added_cond(b, latents.shape[-2] * f,
                                        latents.shape[-1] * f)
        return self._run(
            self.unet_params,
            jnp.asarray(latents),
            ctx,
            ctx,
            jnp.float32(1.0),
            num_steps=num_steps,
            scheduler=scheduler,
            guidance_mode=False,
            invert=True,
            refine=refine,
            added_cond=added,
        )

    @functools.partial(
        jax.jit,
        static_argnames=("self", "num_steps", "scheduler", "refine",
                         "l", "message_bits"),
    )
    def _invert_decode(self, unet_params, latents, ctx, keystream,
                       num_steps: int, scheduler: str, refine: int,
                       l: int, message_bits: int, added_cond=None):
        from gswm.core.decode import _decode_chain

        z_T = self._run(
            unet_params, latents, ctx, ctx, jnp.float32(1.0),
            num_steps=num_steps, scheduler=scheduler, guidance_mode=False,
            invert=True, refine=refine, added_cond=added_cond,
        )
        return _decode_chain(z_T, keystream, l, message_bits), z_T

    def extract_bits(self, cfg, images=None, latents=None,
                     num_steps: int = 50, scheduler: str = "DDIM",
                     refine: int = 0):
        """One-dispatch extraction: inversion scan + quantize/decrypt/vote
        fused into a single jit — the serving shape of the reference's
        extract path (extract.py:46-101, which runs them as separate host
        stages per image).

        The VAE encode stays its own dispatch: fusing the chunked ``lax.map``
        encode into the scan module is what crashed the tunneled remote
        compiler (docs/BENCH.md round 3) — the mid-grain split keeps per-pass
        host dispatches at 2 without that risk.

        Returns ``(bits, z_T)``: voted message bits (B, message_bits) uint8
        and the recovered init noise (fetch only what you use — both stay on
        device until read).
        """
        from gswm.core.decode import _cached_keystream

        if latents is None:
            latents = self.image_to_latents(images)
        rcfg = cfg.resolved()
        key, nonce = rcfg.resolve_key_nonce()
        keystream = _cached_keystream(key, nonce, rcfg.capacity_bits)
        b = latents.shape[0]
        f = 2 ** (len(self.preset.vae.block_out_channels) - 1)
        added = self.default_added_cond(b, latents.shape[-2] * f,
                                        latents.shape[-1] * f)
        return self._invert_decode(
            self.unet_params, jnp.asarray(latents), self.empty_context(b),
            keystream, num_steps=num_steps, scheduler=scheduler,
            refine=refine, l=rcfg.l, message_bits=rcfg.resolved_message_bits,
            added_cond=added,
        )

    # -- reference-pyc API parity (SURVEY.md §2.3) ---------------------------
    # Thin aliases matching InversableStableDiffusionPipeline /
    # ModifiedStableDiffusionPipeline method names so reference-derived code
    # ports by renaming imports only.

    def get_random_latents(self, rng=None, batch: int = 1,
                           height: int = 512, width: int = 512) -> jax.Array:
        rng = rng if rng is not None else jax.random.key(0)
        f = 2 ** (len(self.preset.vae.block_out_channels) - 1)
        return jax.random.normal(
            rng, (batch, self.preset.vae.latent_channels, height // f,
                  width // f), jnp.float32,
        )

    def get_text_embedding(self, prompt_ids) -> jax.Array:
        return self.encode_prompt_ids(prompt_ids)

    def get_image_latents(self, image, sample: bool = False,
                          rng_generator=None) -> jax.Array:
        """VAE-encode; ``sample=False`` (default) is the posterior MEAN the
        extraction path depends on (extract.py:39-43)."""
        x = 2.0 * jnp.asarray(image, jnp.float32) - 1.0
        mean, logvar = self.vae.apply(
            self.vae_params, x, method=type(self.vae).encode_moments
        )
        if sample:
            rng = rng_generator if rng_generator is not None else jax.random.key(0)
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape
            )
        return mean * self.preset.vae.scaling_factor

    def backward_diffusion(self, latents, context=None, guidance_scale=1.0,
                           num_inference_steps: int = 50,
                           reverse_process: bool = False,
                           scheduler: str = "DDIM") -> jax.Array:
        """One name, both directions (the pyc's backward_diffusion had a
        reverse_process flag): False = denoise, True = invert."""
        if reverse_process:
            return self.invert(latents=latents, num_steps=num_inference_steps,
                               scheduler=scheduler)
        return self.generate(latents, context=context,
                             guidance_scale=guidance_scale,
                             num_steps=num_inference_steps,
                             scheduler=scheduler, decode=False)

    def decode_image(self, latents) -> jax.Array:
        img = self.vae.apply(self.vae_params, latents,
                             method=type(self.vae).decode)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

    @staticmethod
    def torch_to_numpy(x) -> np.ndarray:  # name parity; accepts any array
        return np.asarray(x)

    def generate_with_init(self, latents, **kw) -> PipelineOutput:
        """generate() that also returns init_latents (ModifiedSD __call__)."""
        images = self.generate(latents, **kw)
        b = images.shape[0]
        return PipelineOutput(images=images,
                              nsfw_content_detected=[False] * b,
                              init_latents=jnp.asarray(latents))
