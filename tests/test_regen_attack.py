"""The 'reversed' regeneration attack through the pipeline (distortions:
185-192, 302-322 of the reference)."""

import jax
import numpy as np
import pytest
from PIL import Image

from gswm.distortions.attacks import apply_single_distortion
from gswm.pipelines import InversablePipeline


pytestmark = pytest.mark.slow  # compile-heavy; quick loop: -m 'not slow'


def test_reversed_requires_pipe():
    img = Image.fromarray(np.zeros((16, 16, 3), np.uint8))
    with pytest.raises(ValueError, match="pipe"):
        apply_single_distortion(img, "reversed", 8)


def test_reversed_regenerates():
    pipe = InversablePipeline("tiny", rng=jax.random.key(0))
    rng = np.random.default_rng(0)
    img = Image.fromarray((rng.uniform(size=(16, 16, 3)) * 255).astype(np.uint8))
    out = apply_single_distortion(img, "reversed", 8, pipe=pipe)
    assert isinstance(out, Image.Image)
    assert out.size == (16, 16)
    # a random-weight roundtrip must actually change the pixels
    assert not np.array_equal(np.asarray(out), np.asarray(img))
