"""Param cache (convert-once/reload) and profiling utilities."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gswm.models import cache
from gswm.utils.debug import check_finite
from gswm.utils.profiling import stage, stage_report


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {"a": {"kernel": jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)},
            "b": jnp.asarray(rng.normal(size=(3,)), jnp.float32)}


def test_cache_roundtrip(tmp_path):
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    params = _tree(1)
    cache.save_params(params, str(tmp_path / "cache"), str(model_dir), "unet")
    restored = cache.load_params(_tree(2), str(tmp_path / "cache"),
                                 str(model_dir), "unet")
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cache_load_or_convert(tmp_path):
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    calls = []

    def convert():
        calls.append(1)
        return _tree(3)

    cdir = str(tmp_path / "cache")
    p1 = cache.load_or_convert(_tree(0), cdir, str(model_dir), "vae", convert)
    p2 = cache.load_or_convert(_tree(0), cdir, str(model_dir), "vae", convert)
    assert len(calls) == 1  # second load hits the cache
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cache_miss_on_other_model(tmp_path):
    d1 = tmp_path / "m1"; d1.mkdir()
    d2 = tmp_path / "m2"; d2.mkdir()
    cdir = str(tmp_path / "cache")
    cache.save_params(_tree(4), cdir, str(d1), "unet")
    assert cache.load_params(_tree(0), cdir, str(d2), "unet") is None


def test_stage_timing():
    with stage("unit-test-stage", sync=False):
        pass
    rep = stage_report(reset=True)
    assert "unit-test-stage" in rep
    assert rep["unit-test-stage"]["count"] == 1


def test_check_finite():
    assert check_finite(np.ones(4), "ok")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert not check_finite(np.array([1.0, np.nan]), "bad")
        assert any("non-finite" in str(x.message) for x in w)
    with pytest.raises(FloatingPointError):
        check_finite(np.array([np.inf]), "worse", raise_on_bad=True)
