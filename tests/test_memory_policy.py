"""OOM-aware batch policy (gswm.utils.memory.suggest_batch)."""

from gswm.utils.memory import suggest_batch


def test_anchors_are_respected():
    assert suggest_batch(512) == 192
    assert suggest_batch(768) == 32


def test_never_suggests_known_oom_points():
    assert suggest_batch(512) < 256
    assert suggest_batch(768) < 48


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
