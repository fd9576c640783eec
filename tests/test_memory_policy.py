"""OOM-aware batch policy (gswm.utils.memory.suggest_batch)."""

from gswm.utils.memory import suggest_batch


def test_anchors_are_respected():
    assert suggest_batch(512) == 192
    assert suggest_batch(768) == 48


def test_never_suggests_known_oom_points():
    assert suggest_batch(512) < 256
    assert suggest_batch(768) < 64  # 64 projected over-HBM, never probed


def test_requested_clamps_not_replaces():
    assert suggest_batch(512, requested=32) == 32
    assert suggest_batch(512, requested=512) == 192


def test_scales_with_hbm():
    assert suggest_batch(512, hbm_gb=32.0) > suggest_batch(512, hbm_gb=16.0)
    assert suggest_batch(512, hbm_gb=8.0) < suggest_batch(512, hbm_gb=16.0)


def test_interpolates_between_anchors():
    b640 = suggest_batch(640)
    assert suggest_batch(768) <= b640 <= suggest_batch(512)


def test_tile_aligned_and_positive():
    for res in (256, 512, 640, 768, 1024):
        b = suggest_batch(res)
        assert b >= 1
        assert b % 8 == 0 or b == 1


def test_between_anchor_interpolation_is_not_quadratic():
    # ADVICE r2 (medium): res^2 scaling from the 512 anchor predicts 85@768
    # where the measured ceiling is 48.  The log-space fit must stay below
    # the naive quadratic prediction from the LOWER anchor for any res
    # between the anchors.
    for res in (576, 640, 704):
        naive_from_512 = int(192 * (512 / res) ** 2)
        assert suggest_batch(res) < naive_from_512


def test_extrapolation_above_anchors_uses_fitted_exponent():
    # beyond 768 the fitted exponent (~4.4) must apply — quadratic from the
    # 768 anchor would say 48*(768/1024)^2 = 27; the fitted law stays lower.
    assert suggest_batch(1024) <= 16


def test_sdxl_family_anchor():
    # b8 measured OK at 1024² in round 4 (0.7035 imgs/s, no OOM)
    assert suggest_batch(1024, arch="sdxl", requested=160) == 8
    # no other measured sdxl point: nearby res extrapolates conservatively
    assert suggest_batch(1280, arch="sdxl") <= 8


def test_weights_dtype_policy():
    import jax.numpy as jnp

    from gswm.utils.memory import suggest_weights_dtype

    GB = 1024**3
    # sd-2-1-base: 3.5GB fp32 params -> keep fp32 master weights (measured
    # faster, docs/BENCH.md)
    assert suggest_weights_dtype(int(3.5 * GB)) is None
    # sdxl-base: 10.3GB fp32 params cannot share a 16GB chip with 16k-token
    # activations -> bf16 residency
    assert suggest_weights_dtype(int(10.3 * GB)) == jnp.bfloat16
    # smaller chips tighten the limit proportionally
    assert suggest_weights_dtype(int(3.5 * GB), hbm_gb=8.0) == jnp.bfloat16
