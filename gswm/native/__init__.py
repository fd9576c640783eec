"""Native host library loader: compiles gswm_native.cpp on first use (g++,
-O3) and binds it via ctypes; every entry point has a pure-Python fallback so
the package works without a toolchain."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "gswm_native.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so_path = os.path.join(
            tempfile.gettempdir(), f"gswm_native_{digest}.so"
        )
        if not os.path.exists(so_path):
            tmp = so_path + f".build{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
                 "-o", tmp],
                check=True, capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.chacha20_keystream.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.uint8), ctypes.c_uint64,
        ]
        lib.gs_quantize_bits.argtypes = [
            np.ctypeslib.ndpointer(np.float32), ctypes.c_uint64,
            ctypes.c_int, np.ctypeslib.ndpointer(np.uint8),
        ]
        lib.gs_decode.argtypes = [
            np.ctypeslib.ndpointer(np.uint8), ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint32,
            np.ctypeslib.ndpointer(np.uint8),
        ]
        lib.gs_match_accuracy.argtypes = [
            np.ctypeslib.ndpointer(np.uint8),
            np.ctypeslib.ndpointer(np.uint8), ctypes.c_uint32,
        ]
        lib.gs_match_accuracy.restype = ctypes.c_double
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def chacha20_keystream(key: bytes, nonce16: bytes, n_bytes: int) -> bytes:
    lib = _build_and_load()
    if lib is None:
        from gswm.core.chacha import chacha20_keystream as py

        return py(key, nonce16, n_bytes)
    out = np.empty(n_bytes, dtype=np.uint8)
    lib.chacha20_keystream(key, nonce16, out, n_bytes)
    return out.tobytes()


def quantize_bits(latents: np.ndarray, l: int = 1) -> np.ndarray:
    """(...,) float latents -> (n*l,) uint8 bits, stream order."""
    flat = np.ascontiguousarray(latents, dtype=np.float32).ravel()
    lib = _build_and_load()
    out = np.empty(flat.size * l, dtype=np.uint8)
    if lib is None:
        from scipy.stats import norm

        y = np.clip((norm.cdf(flat.astype(np.float64)) * 2**l).astype(np.int64),
                    0, 2**l - 1)
        for j in range(l):
            out[j::l] = (y >> (l - 1 - j)) & 1
        return out
    lib.gs_quantize_bits(flat, flat.size, l, out)
    return out


def decode(quant_bits: np.ndarray, key: bytes, nonce16: bytes,
           message_bits: int) -> np.ndarray:
    """Quantized bit stream -> voted message bits (host hot path)."""
    qb = np.ascontiguousarray(quant_bits, dtype=np.uint8)
    lib = _build_and_load()
    out = np.empty(message_bits, dtype=np.uint8)
    if lib is None:
        ks = np.frombuffer(
            chacha20_keystream(key, nonce16, (qb.size + 7) // 8), np.uint8
        )
        ks_bits = np.unpackbits(ks)[: qb.size]
        payload = qb ^ ks_bits
        segs = qb.size // message_bits
        seg = payload[: segs * message_bits].reshape(segs, message_bits)
        return (seg.sum(0) * 2 > segs).astype(np.uint8)
    lib.gs_decode(qb, qb.size, key, nonce16, message_bits, out)
    return out


def match_accuracy(voted: np.ndarray, expected: np.ndarray) -> float:
    v = np.ascontiguousarray(voted, dtype=np.uint8)
    e = np.ascontiguousarray(expected, dtype=np.uint8)
    lib = _build_and_load()
    if lib is None:
        return float(np.mean(v == e))
    return lib.gs_match_accuracy(v, e, v.size)
