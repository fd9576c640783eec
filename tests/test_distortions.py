"""Distortion bench: host/device agreement on deterministic attacks, strength
mapping parity, and watermark-robustness smoke runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from gswm.distortions import (
    DISTORTION_STRENGTH_PARAS,
    apply_distortion,
    apply_single_distortion,
    relative_strength_to_absolute,
)
from gswm.distortions import device as dev
from gswm.distortions.utils import to_pil, to_tensor


@pytest.fixture()
def img():
    rng = np.random.default_rng(0)
    arr = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    return Image.fromarray(arr)


@pytest.fixture()
def batch():
    rng = np.random.default_rng(1)
    return jnp.asarray(rng.uniform(size=(2, 3, 64, 64)).astype(np.float32))


def test_strength_mapping_matches_reference_table():
    # reference ranges (`distortions`:17-34)
    assert relative_strength_to_absolute(0.5, "rotation") == 180
    assert relative_strength_to_absolute(0.3, "compression") == 70
    assert relative_strength_to_absolute(1.0, "noise") == 0.5
    assert relative_strength_to_absolute(0.5, "resizedcrop") == pytest.approx(0.55)
    # clamped to range
    assert relative_strength_to_absolute(0.0, "brightness") == 1


def test_all_16_attacks_run_host(img):
    for name in DISTORTION_STRENGTH_PARAS:
        if name == "reversed":
            continue  # needs a pipeline; covered in test_pipeline_regen
        out = apply_single_distortion(img, name, None, distortion_seed=3)
        assert isinstance(out, Image.Image)


def test_all_attacks_run_device(batch):
    for name in DISTORTION_STRENGTH_PARAS:
        if name == "reversed":
            continue
        s = relative_strength_to_absolute(0.5, name)
        out = dev.apply(batch, name, s, key=jax.random.key(0))
        assert out.shape[0] == 2 and out.shape[1] == 3
        assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("name", ["horizontal_flip", "vertical_flip", "invert",
                                  "togray", "brightness", "contrast"])
def test_host_device_agree_deterministic(img, name):
    s = relative_strength_to_absolute(0.4, name)
    host = apply_single_distortion(img, name, s)
    x = jnp.asarray(to_tensor([img], norm_type=None))
    devo = dev.apply(x, name, s)
    host_arr = to_tensor([host.convert("RGB")], norm_type=None)[0]
    np.testing.assert_allclose(np.asarray(devo)[0], host_arr, atol=0.02)


def test_device_jpeg_close_to_pil():
    """DCT round trip vs libjpeg at QF=50 on a smooth natural-like image:
    same ballpark (not bit-exact — 4:4:4 vs 4:2:0, no entropy coding).
    Random noise images are JPEG's worst case and are not representative."""
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    arr = np.stack([
        128 + 80 * np.sin(yy / 9.0),
        128 + 80 * np.cos(xx / 7.0),
        128 + 60 * np.sin((xx + yy) / 11.0),
    ], axis=-1).clip(0, 255).astype(np.uint8)
    img = Image.fromarray(arr)
    x = jnp.asarray(to_tensor([img], norm_type=None))
    ours = dev.jpeg_compress(x, 50)
    pil = apply_single_distortion(img, "compression", 50)
    pil_arr = to_tensor([pil.convert("RGB")], norm_type=None)[0]
    err_dev = float(jnp.mean(jnp.abs(ours[0] - pil_arr)))
    # both should be similar distance from the original too
    orig = to_tensor([img], norm_type=None)[0]
    err_vs_orig = float(np.mean(np.abs(np.asarray(ours)[0] - orig)))
    assert err_dev < 0.1, err_dev
    assert err_vs_orig < 0.15


def test_jpeg_quality_ordering(batch):
    """Lower QF must distort more."""
    orig = batch
    e90 = float(jnp.mean(jnp.abs(dev.jpeg_compress(orig, 90) - orig)))
    e10 = float(jnp.mean(jnp.abs(dev.jpeg_compress(orig, 10) - orig)))
    assert e10 > e90 > 0


def test_identity_strengths_are_noops(batch):
    """Strength at the identity end should (nearly) not change the image."""
    np.testing.assert_allclose(
        np.asarray(dev.apply(batch, "rotation", 0.0)), np.asarray(batch),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(dev.apply(batch, "brightness", 1.0)), np.asarray(batch),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(dev.apply(batch, "noise", 0.0, key=jax.random.key(1))),
        np.asarray(batch), atol=1e-6,
    )


def test_per_image_seed_increment(img):
    """same_operation=False gives different noise per image
    (`distortions`:71-79)."""
    outs = apply_distortion([img, img], "noise", 0.8, distortion_seed=0,
                            relative_strength=True)
    a, b = (np.asarray(o) for o in outs)
    assert not np.array_equal(a, b)
    outs_same = apply_distortion([img, img], "noise", 0.8, distortion_seed=0,
                                 same_operation=True, relative_strength=True)
    a, b = (np.asarray(o) for o in outs_same)
    np.testing.assert_array_equal(a, b)


def test_roundtrip_utils(img):
    t = to_tensor([img], norm_type=None)
    back = to_pil(t, norm_type=None)[0]
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))
