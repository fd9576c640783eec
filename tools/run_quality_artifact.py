"""On-chip "performance-lossless" quality artifact (VERDICT r4 missing #4).

The paper's headline quality claim (README.md:19, the pyc
``optim_utils.measure_similarity`` role in SURVEY.md §2.3) is that
Gaussian-Shading embedding is *distribution-preserving*: a watermarked
Z_T is exactly N(0,1), so generations from watermarked and unwatermarked
seeds are statistically indistinguishable — no CLIP model needed for the
weight-independent half of that claim.

Protocol: draw B unwatermarked latents  z ~ N(0,1)  and B watermarked
latents  z = ndtri((u + y)/2^l)  from INDEPENDENT streams of the same
seed, run both populations through the same ``pipe.generate`` (same step
count, same guidance), and compare:

  latent-space:  per-population mean/std; two-sample KS on pooled latent
                 values; one-sample KS of the watermarked Z_T against the
                 exact N(0,1) CDF (the embed-side contract,
                 tests/test_embed_decode.py:102's chip-scale sibling)
  pixel-space:   per-population mean/std; two-sample KS on pooled pixels
                 (subsampled); per-image statistic distributions (mean,
                 std, high-frequency energy) compared via two-sample KS;
                 PSNR between the POPULATION MEAN images (not pairs —
                 individual images differ by construction)

Pass criteria printed with each row: two-sample KS p-values well above
any rejection threshold (the populations are the same distribution), and
population-mean PSNR at the level two same-size Gaussian-seed batches
give each other.

Writes benchmarks/quality_lossless_<preset>_<res>_tpu.jsonl.

Run (one TPU job at a time):
  python tools/run_quality_artifact.py --batch 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def ks_two_sample(a, b):
    """Two-sample KS statistic + asymptotic p-value (scipy-free)."""
    import numpy as np

    a = np.sort(a.ravel())
    b = np.sort(b.ravel())
    n, m = len(a), len(b)
    both = np.concatenate([a, b])
    cdf_a = np.searchsorted(a, both, side="right") / n
    cdf_b = np.searchsorted(b, both, side="right") / m
    d = float(np.max(np.abs(cdf_a - cdf_b)))
    en = np.sqrt(n * m / (n + m))
    # Kolmogorov asymptotic survival function
    t = (en + 0.12 + 0.11 / en) * d
    p = 2.0 * sum((-1.0) ** (k - 1) * np.exp(-2.0 * (k * t) ** 2)
                  for k in range(1, 101))
    return d, float(min(max(p, 0.0), 1.0))


def ks_normal(a):
    """One-sample KS against the exact N(0,1) CDF."""
    import math

    import numpy as np

    a = np.sort(a.ravel())
    n = len(a)
    cdf = 0.5 * (1.0 + np.vectorize(math.erf)(a / np.sqrt(2.0)))
    d_plus = np.max(np.arange(1, n + 1) / n - cdf)
    d_minus = np.max(cdf - np.arange(0, n) / n)
    d = float(max(d_plus, d_minus))
    en = math.sqrt(n)
    t = (en + 0.12 + 0.11 / en) * d
    p = 2.0 * sum((-1.0) ** (k - 1) * math.exp(-2.0 * (k * t) ** 2)
                  for k in range(1, 101))
    return d, float(min(max(p, 0.0), 1.0))


def hf_energy(imgs):
    """Per-image high-frequency energy: mean squared residual of a 3x3 box
    blur — the band JPEG/blur attacks touch first, and where a
    distribution-shifting embed would most plausibly show."""
    import numpy as np

    k = np.ones((3, 3), np.float32) / 9.0
    out = []
    for x in imgs:
        acc = 0.0
        for c in range(x.shape[0]):
            p = np.pad(x[c], 1, mode="edge")
            blur = sum(
                p[i:i + x.shape[1], j:j + x.shape[2]] * k[i, j]
                for i in range(3) for j in range(3))
            acc += float(np.mean((x[c] - blur) ** 2))
        out.append(acc / x.shape[0])
    import numpy as np

    return np.asarray(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="sd-2-1-base")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--pixels-per-image", type=int, default=4096,
                    help="pixel subsample per image for the pooled KS")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        os.environ.setdefault("GSWM_PLATFORM", "cpu")
    from gswm.utils.platform import apply_platform_env, cpu_cache_dir

    apply_platform_env()
    jax.config.update(
        "jax_compilation_cache_dir",
        cpu_cache_dir() if jax.default_backend() == "cpu"
        else "/tmp/gswm-jax-cache")

    import jax.numpy as jnp
    import numpy as np

    from gswm.config import GSConfig
    from gswm.core.embed import embed_latents
    from gswm.pipelines import InversablePipeline

    out = args.out or (f"benchmarks/quality_lossless_"
                       f"{args.preset.replace('-', '')[:8]}arch_"
                       f"{args.res}_tpu.jsonl")
    pipe = InversablePipeline(args.preset, rng=jax.random.key(0))
    f = 2 ** (len(pipe.preset.vae.block_out_channels) - 1)
    cfg = GSConfig(key_hex="22" * 32, nonce_hex="33" * 16, message="lthero",
                   width=args.res, height=args.res, vae_scale=f,
                   message_bits=256 if f == 8 else 32)

    b = args.batch
    lat_hw = args.res // f
    c = pipe.preset.vae.latent_channels

    # Two watermarked populations (the distinction matters):
    #   wm_indep — each image gets its OWN watermark stream (per-image
    #              nonce): the population marginal is exactly iid N(0,1).
    #              This is the paper's lossless claim — z ~ N(0,1) with the
    #              key/nonce marginalized — and the PRIMARY pixel test.
    #   wm_fixed — the serving reality: one key/nonce/message for the whole
    #              batch, so every image shares one y draw and the
    #              population is CONDITIONED on it.  Population statistics
    #              legitimately deviate (the shared quantile-band pattern
    #              shifts every image the same way); recorded with that
    #              framing, not as a failure.
    import dataclasses as _dc

    k_wm, k_plain, k_ind = jax.random.split(jax.random.key(2024), 3)
    zT_fixed, _msg = embed_latents(cfg, rng=k_wm, batch=b)
    zT_plain = jax.random.normal(k_plain, (b, c, lat_hw, lat_hw))
    per_img = [
        embed_latents(_dc.replace(cfg, nonce_hex=f"{(i + 1):032x}"),
                      rng=jax.random.fold_in(k_ind, i), batch=1)[0]
        for i in range(b)
    ]
    zT_indep = jnp.concatenate(per_img, axis=0)

    rows = []
    t0 = time.time()

    # --- latent-space rows (cheap, exact contract) ------------------------
    pl = np.asarray(zT_plain, np.float64).ravel()
    for name, z in (("wm_indep", zT_indep), ("wm_fixed", zT_fixed)):
        wm = np.asarray(z, np.float64).ravel()
        d2, p2 = ks_two_sample(wm, pl)
        d1, p1 = ks_normal(wm)
        rows.append({
            "space": "latent", "population": name, "batch": b,
            "elements": int(wm.size),
            "wm_mean": float(wm.mean()), "wm_std": float(wm.std()),
            "plain_mean": float(pl.mean()), "plain_std": float(pl.std()),
            "ks2_stat": d2, "ks2_p": p2,
            "ks1_normal_stat": d1, "ks1_normal_p": p1,
        })
        print(f"latent[{name}]: mean {wm.mean():+.5f} std {wm.std():.5f} | "
              f"vs plain KS D={d2:.5f} p={p2:.3f} | "
              f"vs N(0,1) KS D={d1:.5f} p={p1:.3f}", flush=True)

    # --- generate all populations (same pipeline, same steps) -------------
    print(f"generating 3 x {b} images at {args.res}^2, {args.steps} steps "
          "...", flush=True)
    imgs_wm = np.asarray(pipe.generate(zT_indep, guidance_scale=1.0,
                                       num_steps=args.steps), np.float32)
    imgs_fx = np.asarray(pipe.generate(zT_fixed, guidance_scale=1.0,
                                       num_steps=args.steps), np.float32)
    imgs_pl = np.asarray(pipe.generate(jnp.asarray(zT_plain),
                                       guidance_scale=1.0,
                                       num_steps=args.steps), np.float32)
    print(f"generated in {time.time() - t0:.0f}s", flush=True)

    # pooled pixel KS on a seeded subsample (full pooled arrays are 100M+).
    # CONTROL for every pixel-space statistic: the same quantity between the
    # two HALVES of the unwatermarked population.  Pixels within an image
    # are correlated, so the pooled KS's iid assumption is violated and its
    # p-value runs hot even for identical distributions — the pass criterion
    # is wm-vs-plain ~ control, not p > 0.05 in the abstract.
    rng = np.random.default_rng(7)
    npx = min(args.pixels_per_image, imgs_wm[0].size)
    idx = rng.choice(imgs_wm[0].size, size=npx, replace=False)
    half = b // 2

    def pooled(imgs):
        return np.stack([im.ravel()[idx] for im in imgs]).ravel()

    def psnr(a, bb):
        mse = float(np.mean((a - bb) ** 2))
        return 99.0 if mse == 0 else float(10 * np.log10(1.0 / mse))

    sub_pl = pooled(imgs_pl)
    d2c, p2c = ks_two_sample(pooled(imgs_pl[:half]), pooled(imgs_pl[half:]))
    m_pl = imgs_pl.reshape(b, -1).mean(1)
    s_pl = imgs_pl.reshape(b, -1).std(1)
    h_pl = hf_energy(imgs_pl)
    ks_mean_ctrl = ks_two_sample(m_pl[:half], m_pl[half:])
    psnr_ctrl = psnr(imgs_pl[:half].mean(0), imgs_pl[half:].mean(0))

    for name, imgs in (("wm_indep", imgs_wm), ("wm_fixed", imgs_fx)):
        d2p, p2p = ks_two_sample(pooled(imgs), sub_pl)
        # per-image statistic distributions (one observation per image:
        # the iid unit is the image, so these p-values ARE calibrated)
        m = imgs.reshape(b, -1).mean(1)
        s = imgs.reshape(b, -1).std(1)
        h = hf_energy(imgs)
        ks_mean = ks_two_sample(m, m_pl)
        ks_std = ks_two_sample(s, s_pl)
        ks_hf = ks_two_sample(h, h_pl)
        psnr_pop = psnr(imgs.mean(0), imgs_pl.mean(0))

        rows.append({
            "space": "pixel", "population": name, "batch": b,
            "res": args.res, "steps": args.steps,
            "subsampled_pixels": int(sub_pl.size),
            "wm_mean": float(imgs.mean()), "wm_std": float(imgs.std()),
            "plain_mean": float(imgs_pl.mean()),
            "plain_std": float(imgs_pl.std()),
            "ks2_pixels_stat": d2p, "ks2_pixels_p": p2p,
            "ks2_pixels_control_stat": d2c, "ks2_pixels_control_p": p2c,
            "ks2_per_image_mean": {"stat": ks_mean[0], "p": ks_mean[1]},
            "ks2_per_image_mean_control": {"stat": ks_mean_ctrl[0],
                                           "p": ks_mean_ctrl[1]},
            "ks2_per_image_std": {"stat": ks_std[0], "p": ks_std[1]},
            "ks2_per_image_hf_energy": {"stat": ks_hf[0], "p": ks_hf[1]},
            "psnr_population_means_db": psnr_pop,
            "psnr_control_split_db": psnr_ctrl,
        })
        print(f"pixel[{name}]: mean {imgs.mean():+.5f} std "
              f"{imgs.std():.5f} | plain mean {imgs_pl.mean():+.5f} std "
              f"{imgs_pl.std():.5f}", flush=True)
        print(f"  pooled-pixel KS D={d2p:.5f} (control D={d2c:.5f}); "
              f"per-image KS mean p={ks_mean[1]:.3f} "
              f"(control p={ks_mean_ctrl[1]:.3f}) std p={ks_std[1]:.3f} "
              f"hf p={ks_hf[1]:.3f}", flush=True)
        print(f"  population-mean PSNR {psnr_pop:.2f} dB "
              f"(control split-half: {psnr_ctrl:.2f} dB)", flush=True)

    meta = {"tool": "tools/run_quality_artifact.py", "preset": args.preset,
            "seed_protocol": "independent streams of jax.random.key(2024)",
            "weights": "random UNet + fitted VAE (no SD checkpoints "
                       "offline); the latent row is weight-independent, "
                       "the pixel rows test the same generate() both ways"}
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        fh.write(json.dumps(meta) + "\n")
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
