"""CLIP quality-score path (gswm.eval.quality.measure_similarity).

The reference's compiled-only optim_utils.measure_similarity backs the
paper's "performance-lossless" claim (SURVEY.md §2.3).  Real CLIP weights
don't exist in this offline environment, so these tests exercise the full
measure_similarity code path — image normalization, PIL conversion,
processor call, embedding cosine — through a stubbed model/processor pair
with the real FlaxCLIPModel output contract.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import gswm.eval.quality as quality


class _FakeOutput:
    def __init__(self, image_embeds, text_embeds):
        self.image_embeds = image_embeds
        self.text_embeds = text_embeds


class _FakeModel:
    """Deterministic stand-in: embeds are mean-pooled pixel / token stats, so
    identical (image, prompt) pairs score 1.0 and unrelated pairs don't."""

    def __call__(self, *, pixel_values, input_ids, attention_mask=None):
        b = pixel_values.shape[0]
        img = jnp.stack(
            [jnp.asarray(pixel_values[i]).reshape(3, -1).mean(axis=1)
             for i in range(b)]
        )
        txt = []
        for row in np.asarray(input_ids):
            v = np.zeros(3, np.float32)
            v[: len(row) % 3 + 1] = 1.0
            v += 1e-3 * row.sum()
            txt.append(v)
        return _FakeOutput(img, jnp.asarray(np.stack(txt)))


class _FakeProcessor:
    def __call__(self, *, text, images, return_tensors, padding):
        assert return_tensors == "np"
        pix = np.stack(
            [np.asarray(im, np.float32).transpose(2, 0, 1) / 255.0
             for im in images]
        )
        ids = np.stack(
            [np.frombuffer(t.encode()[:8].ljust(8), np.uint8).astype(np.int64)
             for t in text]
        )
        return {"pixel_values": pix, "input_ids": ids}


@pytest.fixture
def stub_clip(monkeypatch):
    monkeypatch.setattr(
        quality, "_load_clip", lambda model_dir: (_FakeModel(),
                                                  _FakeProcessor())
    )


def test_measure_similarity_array_input(stub_clip):
    imgs = np.random.default_rng(0).uniform(0, 1, (3, 3, 16, 16)).astype(
        np.float32
    )
    scores = quality.measure_similarity(imgs, ["a", "bb", "ccc"], "/nonexistent")
    assert scores.shape == (3,)
    assert np.all(scores <= 1.0 + 1e-6) and np.all(scores >= -1.0 - 1e-6)


def test_measure_similarity_identical_embeds_score_one(stub_clip):
    # A constant white image -> image embed (1,1,1)/|.|; prompt chosen so the
    # fake text embed is also all-ones -> cosine 1.
    from PIL import Image

    img = Image.new("RGB", (8, 8), (255, 255, 255))
    scores = quality.measure_similarity([img, img], ["xy", "xy"], "/nope")
    np.testing.assert_allclose(scores, scores[::-1])  # deterministic
    assert scores[0] > 0.6  # aligned direction


def test_measure_similarity_ranks_aligned_pairs_higher(stub_clip):
    from PIL import Image

    white = Image.new("RGB", (8, 8), (255, 255, 255))
    red = Image.new("RGB", (8, 8), (255, 0, 0))
    # "xy" -> text embed ~(1,1,1): closer to white's (1,1,1) than red's (1,0,0)
    s = quality.measure_similarity([white, red], ["xy", "xy"], "/nope")
    assert s[0] > s[1]
