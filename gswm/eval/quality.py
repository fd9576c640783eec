"""Image-quality evaluation: CLIP image-text similarity.

Parity with the reference's compiled-only optim_utils.measure_similarity
(SURVEY.md §2.3) — the score used to verify the watermark is
performance-lossless.  Uses transformers' FlaxCLIPModel from a LOCAL
checkpoint directory (offline environment: no hub access)."""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=1)
def _load_clip(model_dir: str):
    from transformers import CLIPProcessor, FlaxCLIPModel

    model = FlaxCLIPModel.from_pretrained(model_dir, local_files_only=True)
    processor = CLIPProcessor.from_pretrained(model_dir, local_files_only=True)
    return model, processor


def measure_similarity(images, prompts, model_dir: str) -> np.ndarray:
    """Cosine similarity between image and text CLIP embeddings.

    images: list of PIL images or (B, 3, H, W) array in [0,1];
    prompts: list of strings.  Returns (B,) scores.
    """
    from PIL import Image

    model, processor = _load_clip(model_dir)
    if not isinstance(images, (list, tuple)):
        arr = np.asarray(images)
        images = [
            Image.fromarray((a.transpose(1, 2, 0) * 255).astype(np.uint8))
            for a in arr
        ]
    inputs = processor(text=list(prompts), images=images, return_tensors="np",
                       padding=True)
    out = model(**inputs)
    img = out.image_embeds / jnp.linalg.norm(out.image_embeds, axis=-1,
                                             keepdims=True)
    txt = out.text_embeds / jnp.linalg.norm(out.text_embeds, axis=-1,
                                            keepdims=True)
    return np.asarray(jnp.sum(img * txt, axis=-1))
