"""Robustness sweep driver — reproduces the reference's Results.png protocol
(BASELINE config 3): generate watermarked images, attack at increasing
strengths, extract, and report bit accuracy per (attack, strength).

Attacks run batched on device by default (gswm.distortions.device), the
whole sweep reuses one jitted pipeline, and results land in jsonl + a
result.txt-style mirror per attack directory.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional

import numpy as np

from gswm.config import GSConfig
from gswm.core import bits as bitops
from gswm.core.decode import recover_message_bits
from gswm.core.embed import embed_latents
from gswm.distortions.attacks import relative_strength_to_absolute
from gswm.eval.detection import tpr_at_fpr
from gswm.utils.io import write_jsonlines

# "none" is the lossless control (BASELINE.md row 1: 100% bit accuracy with
# no distortion) — it pins the sweep's ceiling so attack rows read relative
# to what the model/VAE pair can recover at all.
DEFAULT_ATTACKS = (
    "none",
    "compression", "blurring", "noise", "brightness", "contrast", "elastic",
    "erasing", "resizedcrop", "scaling", "randomcrop", "rotation",
    "horizontal_flip", "vertical_flip", "togray", "invert", "reversed",
)


@dataclasses.dataclass
class SweepResult:
    attack: str
    relative_strength: float
    absolute_strength: float
    bit_accuracy_mean: float
    bit_accuracies: list[float]
    tpr_at_1e6: float
    # extraction scheduler (extract.py:50-54's --scheduler: DDIM | DPMs);
    # default matches every pre-round-5 artifact, which was DDIM-only
    scheduler: str = "DDIM"


def _add_texture(images, amp: float, key):
    """Blend a seeded high-frequency texture field into images in [0,1].

    The field is pixel-level uniform noise minus its own 3x3 box blur —
    zero-mean, concentrated above the blur's cutoff, i.e. exactly the band
    JPEG quantization and blurring attacks remove first.  Deterministic per
    key so the 'none' control and every attack row see the same inputs.
    """
    import jax
    import jax.numpy as jnp

    u = jax.random.uniform(key, images.shape, jnp.float32) - 0.5
    k = jnp.ones((3, 3), jnp.float32) / 9.0
    blur = jax.lax.conv_general_dilated(
        u.reshape(-1, 1, *images.shape[-2:]), k[None, None],
        (1, 1), "SAME").reshape(images.shape)
    hf = u - blur
    return jnp.clip(images + amp * hf, 0.0, 1.0)


def _host_jpeg(images, quality: int):
    """Exact libjpeg round-trip via PIL (`distortions`:175-184 semantics) —
    the report-grade compression path; the on-device DCT JPEG is the fast
    approximation (SURVEY.md §7.3: "ship both, report with the exact one")."""
    from PIL import Image

    arr = np.asarray(images)  # (B, 3, H, W) in [0, 1]
    out = []
    for x in arr:
        im = Image.fromarray(
            (np.transpose(x, (1, 2, 0)) * 255).round().astype(np.uint8)
        )
        from gswm.distortions.attacks import apply_single_distortion

        im = apply_single_distortion(im, "compression", float(quality))
        out.append(
            np.transpose(np.asarray(im, np.float32) / 255.0, (2, 0, 1))
        )
    return np.stack(out)


def run_sweep(
    pipe,
    cfg: GSConfig,
    batch: int = 8,
    num_steps: int = 30,
    attacks: Iterable[str] = DEFAULT_ATTACKS,
    strengths: Iterable[float] = (0.1, 0.3, 0.5, 0.7, 0.9),
    rng=None,
    scheduler: str = "DDIM",
    out_jsonl: Optional[str] = None,
    guidance_scale: float = 1.0,
    jpeg: str = "device",
    texture_amp: float = 0.0,
    extract_steps_rows: Iterable[int] = (),
) -> list[SweepResult]:
    """``jpeg`` selects the compression implementation: 'device' = batched
    DCT round-trip on-TPU (fast, approximate), 'host' = exact libjpeg via
    PIL (what the reference's bench uses).

    ``texture_amp`` > 0 blends a seeded high-frequency texture field into
    the generated images before any attack (input hardening: random-UNet
    outputs are low-texture, so value attacks like JPEG bite less than on
    real SD images — VERDICT r3 weak #3).  The 'none' control then shows
    whether the texture alone costs accuracy, and attack rows degrade the
    way textured real images would.

    ``extract_steps_rows`` adds extra lossless control rows extracted at
    other step counts — e.g. (50,) records the reference's recommended
    50-step extraction setting (README.md:265-266) alongside the sweep's
    default.  Reported as attack='none@{n}step'.
    """
    import jax

    from gswm.distortions import device as dev

    if jpeg not in ("device", "host"):
        raise ValueError(f"jpeg must be 'device' or 'host', got {jpeg!r}")
    rng = rng if rng is not None else jax.random.key(0)
    k_embed, k_attack, k_tex = jax.random.split(rng, 3)

    zT, msg = embed_latents(cfg, rng=k_embed, batch=batch)
    expected = bitops.bytes_to_bits(msg)
    images = pipe.generate(zT, guidance_scale=guidance_scale,
                           num_steps=num_steps, scheduler=scheduler)
    if texture_amp > 0.0:
        images = _add_texture(images, texture_amp, k_tex)

    results = []
    for n in extract_steps_rows:
        z_back = pipe.invert(images=images, num_steps=int(n),
                             scheduler=scheduler)
        voted = np.asarray(recover_message_bits(z_back, cfg))
        accs = [float(np.mean(v == expected)) for v in voted]
        results.append(SweepResult(
            attack=f"none@{int(n)}step", relative_strength=0.0,
            absolute_strength=0.0,
            bit_accuracy_mean=float(np.mean(accs)), bit_accuracies=accs,
            tpr_at_1e6=tpr_at_fpr(accs, cfg.resolved_message_bits),
            scheduler=scheduler,
        ))
    for attack in attacks:
        for rel in ((0.0,) if attack == "none" else strengths):
            absolute = (0.0 if attack == "none"
                        else relative_strength_to_absolute(rel, attack))
            if attack == "none":
                attacked = images
            elif attack == "reversed":
                # regeneration attack (`distortions`:302-322): DDIM-invert
                # the image and re-generate, strength = step count —
                # device-native through the same pipeline
                steps = max(int(absolute), 1)
                z_regen = pipe.invert(images=images, num_steps=steps)
                attacked = pipe.generate(z_regen, guidance_scale=1.0,
                                         num_steps=steps)
            elif attack == "compression" and jpeg == "host":
                attacked = jax.numpy.asarray(
                    _host_jpeg(images, int(absolute))
                )
            else:
                attacked = dev.apply(images, attack, absolute,
                                     key=jax.random.fold_in(k_attack, hash(attack) % 2**31))
            if attacked.shape[-2:] != images.shape[-2:]:
                # size-changing attacks (scaling): extraction always resizes
                # back to the nominal resolution first (extract.py:31-37)
                import jax.image

                attacked = jax.image.resize(attacked, images.shape, "cubic")
            z_back = pipe.invert(images=attacked, num_steps=num_steps,
                                 scheduler=scheduler)
            voted = np.asarray(recover_message_bits(z_back, cfg))
            accs = [float(np.mean(v == expected)) for v in voted]
            results.append(SweepResult(
                attack=attack,
                relative_strength=float(rel),
                absolute_strength=float(absolute),
                bit_accuracy_mean=float(np.mean(accs)),
                bit_accuracies=accs,
                tpr_at_1e6=tpr_at_fpr(accs, cfg.resolved_message_bits),
                scheduler=scheduler,
            ))
    if out_jsonl:
        write_jsonlines((dataclasses.asdict(r) for r in results), out_jsonl)
    return results
