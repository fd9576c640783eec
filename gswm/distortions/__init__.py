"""Robustness bench: the reference's 16-attack distortion suite
(`distortions`:17-34, credited there to the WAVES benchmark) rebuilt with two
backends:

  * ``host``   — PIL/numpy exact implementations (bit-faithful JPEG via
                 libjpeg, PIL resampling) for report-grade numbers;
  * ``device`` — batched jnp implementations that run the whole sweep on TPU
                 (JPEG as a DCT-quantization round trip).

Also provides the ``utils`` module (set_random_seed / to_tensor / to_pil)
that the reference imports but never ships (`distortions`:11 — SURVEY.md
§7.3 "missing module").
"""

from gswm.distortions.attacks import (  # noqa: F401
    DISTORTION_STRENGTH_PARAS,
    apply_distortion,
    apply_single_distortion,
    apply_multiple_distortions,
    relative_strength_to_absolute,
)
from gswm.distortions import device as device_attacks  # noqa: F401
