"""Sweep driver, prompt datasets, and optim_utils-compat helpers."""

import argparse

import jax
import numpy as np
import pytest
from PIL import Image

from gswm.config import GSConfig
from gswm.eval.datasets import BUILTIN_PROMPTS, get_dataset
from gswm.eval.sweep import run_sweep
from gswm.pipelines import InversablePipeline
from gswm.treering.compat import image_distortion, latents_to_imgs, transform_img

pytestmark = pytest.mark.slow  # pipeline sweep smoke; quick loop: -m 'not slow'


@pytest.fixture(scope="module")
def pipe():
    return InversablePipeline("tiny", rng=jax.random.key(0))


def test_sweep_smoke(pipe, tmp_path):
    cfg = GSConfig(key_hex="22" * 32, nonce_hex="33" * 16, message="sweep",
                   width=16, height=16, vae_scale=2, message_bits=32)
    results = run_sweep(
        pipe, cfg, batch=2, num_steps=4,
        attacks=("noise", "horizontal_flip", "scaling"), strengths=(0.2,),
        out_jsonl=str(tmp_path / "sweep.jsonl"),
    )
    assert len(results) == 3
    for r in results:
        assert 0.0 <= r.bit_accuracy_mean <= 1.0
        assert len(r.bit_accuracies) == 2
    from gswm.utils.io import load_jsonlines

    recs = load_jsonlines(str(tmp_path / "sweep.jsonl"))
    assert recs[0]["attack"] == "noise"


def test_get_dataset_sources(tmp_path):
    assert get_dataset() == BUILTIN_PROMPTS
    assert get_dataset(limit=3) == BUILTIN_PROMPTS[:3]
    p = tmp_path / "prompts.jsonl"
    p.write_text('{"Prompt": "a"}\n{"Prompt": "b"}\n')
    assert get_dataset(str(p)) == ["a", "b"]
    t = tmp_path / "prompts.txt"
    t.write_text("x\ny\n\n")
    assert get_dataset(str(t)) == ["x", "y"]


def test_transform_img_shape():
    img = Image.fromarray(np.zeros((100, 160, 3), np.uint8))
    out = transform_img(img, 64)
    assert out.shape == (3, 64, 64)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_latents_to_imgs(pipe):
    lat = jax.random.normal(jax.random.key(2), (2, 4, 8, 8))
    imgs = latents_to_imgs(pipe, lat)
    assert len(imgs) == 2 and imgs[0].size == (16, 16)


def test_image_distortion_pair():
    rng = np.random.default_rng(0)
    img1 = Image.fromarray((rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8))
    img2 = Image.fromarray((rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8))
    args = argparse.Namespace(jpeg_ratio=50, gaussian_std=0.1,
                              distortion_seed=1)
    out1, out2 = image_distortion(img1, img2, args)
    assert out1.size == (32, 32) and out2.size == (32, 32)
    # same chain, same seed -> same noise realization applied to both
    assert not np.array_equal(np.asarray(out1), np.asarray(img1))
