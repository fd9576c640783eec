"""Pipelines: generation AND inversion with one weight set.

The reference shoves an inverse scheduler into a forward diffusers pipeline
and rebuilds it from_pretrained for every image (extract.py:56-69 — SURVEY.md
§3.2 flags the reload).  Its author's own compiled-only module proves the
intended design was a first-class InversableStableDiffusionPipeline
(SURVEY.md §2.3).  That is what lives here: build once, jit once per
(shape, steps, scheduler), reuse across a whole directory sweep.
"""

from gswm.pipelines.inversable import InversablePipeline  # noqa: F401
