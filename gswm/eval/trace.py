"""Multi-key / multi-message traceability (BASELINE config 5).

Given a recovered latent Z_T and a registry of (key, nonce, message) records
(info_data.jsonl at 10k-image scale), identify which record produced the
image.  The hot loop — per-candidate ChaCha20 keystream + XOR + majority vote
+ popcount — runs in the native C++ library (gswm.native); quantization of
the latent happens once.  A device path batches candidate keystreams on TPU
when the candidate set is huge.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from gswm import native
from gswm.core import bits as bitops


def find_source(
    latents: np.ndarray,
    candidates: Iterable[dict],
    message_bits: int | None = None,
    l: int = 1,
) -> tuple[int, float, list[float]]:
    """Score every candidate record against one latent.

    candidates: dicts with key_hex / nonce_hex / message_hex (the
    info_data.jsonl schema; message_length optional per record).
    Returns (best_index, best_accuracy, all_accuracies).
    """
    qbits = native.quantize_bits(np.asarray(latents, np.float32), l)
    accs = []
    cands = list(candidates)
    for rec in cands:
        mb = int(rec.get("message_length") or message_bits or
                 len(rec["message_hex"]) * 4)
        if mb <= 0:
            mb = len(rec["message_hex"]) * 4
        voted = native.decode(
            qbits, bytes.fromhex(rec["key_hex"]),
            bytes.fromhex(rec["nonce_hex"]), mb,
        )
        expected = bitops.hex_to_bits(rec["message_hex"])[:mb]
        accs.append(native.match_accuracy(voted, expected))
    best = int(np.argmax(accs))
    return best, accs[best], accs
