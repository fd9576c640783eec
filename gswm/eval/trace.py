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


def find_source_device(
    latents,
    candidates: Iterable[dict],
    message_bits: int | None = None,
    l: int = 1,
    chunk: int = 4096,
) -> tuple[int, float, list[float]]:
    """Device-batched candidate scoring (the path the module docstring
    promises): all candidate keystreams are generated on-device by the
    vmapped ChaCha kernel (gswm.core.multikey.batch_keystream_bits), XORed
    against the once-quantized latent bits, majority-voted and scored as ONE
    XLA computation per chunk — no per-candidate host loop.

    Candidates must share message_bits (the registry's serving shape); use
    find_source for mixed-length registries.  Same return contract.
    """
    import jax
    import jax.numpy as jnp

    from gswm.core.decode import majority_vote, quantize_latent_bits
    from gswm.core.multikey import batch_keystream_bits

    cands = list(candidates)
    mbs = {
        int(rec.get("message_length") or message_bits or
            len(rec["message_hex"]) * 4)
        for rec in cands
    }
    if len(mbs) != 1:
        raise ValueError(
            f"find_source_device needs uniform message_bits, got {sorted(mbs)}"
        )
    mb = mbs.pop()

    qbits = quantize_latent_bits(jnp.asarray(latents, jnp.float32), l)
    n_bits = int(qbits.shape[-1])

    @jax.jit
    def score(ks, expected):
        payload = qbits[None, :] ^ ks
        voted = majority_vote(payload, mb)
        return jnp.mean((voted == expected).astype(jnp.float32), axis=-1)

    accs: list[float] = []
    for start in range(0, len(cands), chunk):
        batch = cands[start : start + chunk]
        keys = [bytes.fromhex(r["key_hex"]) for r in batch]
        nonces = [bytes.fromhex(r["nonce_hex"]) for r in batch]
        expected = np.stack(
            [bitops.hex_to_bits(r["message_hex"])[:mb] for r in batch]
        )
        ks = batch_keystream_bits(keys, nonces, n_bits)
        accs.extend(np.asarray(score(ks, jnp.asarray(expected))).tolist())
    best = int(np.argmax(accs))
    return best, accs[best], accs
